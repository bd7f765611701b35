"""Line-level corpus cleaning (C4 / RefinedWeb-style).

Web-scale training corpora carry two intra-document pathologies that
document-level dedup (operators/dedup.py) cannot see: repeated lines
inside one document (navigation chrome, scraped pagination) and
boilerplate lines shared across many documents (cookie banners,
footers). The standard cleaning pass drops both; this is its
deterministic Spark formulation.

Contract (deterministic, order-preserving):
1. Split text on newlines; a line's identity is its normalized form
   (lower + trim — ``functions.text.norm_text``).
2. WITHIN a document: keep only the FIRST occurrence of each normalized
   line (by line position).
3. ACROSS the corpus: drop every line whose normalized form occurs in
   more than ``max_line_df`` DISTINCT documents (the boilerplate
   threshold), unless the form is empty (blank separators stay).
4. Reassemble surviving lines in original order.

Scale shape (100 TB): one explode (bounded by total line count), the
within-doc first-occurrence window partitions by (doc, line-form), the
document frequency is a per-form aggregate joined back on the SAME key
the explode already shuffled on, and the rebuild is one groupBy(doc).
No UDFs; the only higher-order call (rebuilding the line array) runs
once per document over an already-aggregated array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import norm_text


def clean_lines(
    docs: DataFrame,
    max_line_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id_col, text_clean, n_lines_in, n_lines_kept).

    ``max_line_df``: a normalized line occurring in MORE than this many
    distinct documents is boilerplate and is removed everywhere.
    """
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    ).withColumn("form", norm_text(F.col("line")))

    # within-doc first occurrence (step 2)
    first_w = W.partitionBy("id", "form").orderBy("pos")
    lines = lines.withColumn("_rk", F.row_number().over(first_w)).where(
        (F.col("_rk") == 1) | (F.col("form") == "")
    )

    # corpus-wide document frequency per form (step 3); the groupBy key
    # matches the window's leading key so the exchange is reused
    ldf = (
        lines.where(F.col("form") != "")
        .groupBy("form")
        .agg(F.countDistinct("id").alias("_df"))
        .where(F.col("_df") > F.lit(max_line_df))
        .select("form", F.lit(True).alias("_boiler"))
    )
    kept = (
        lines.join(ldf, "form", "left")
        .where(F.col("_boiler").isNull())
        .select("id", "pos", "line")
    )

    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
        F.count("*").alias("n_lines_kept"),
    )
    n_in = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "n_lines_in"
        ),
    )
    return (
        n_in.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            "n_lines_in",
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long").alias(
                "n_lines_kept"
            ),
        )
    )
