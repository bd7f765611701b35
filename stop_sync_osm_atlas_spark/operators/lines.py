"""Line-level corpus cleaning (C4 / RefinedWeb-style).

Web-scale training corpora carry two intra-document pathologies that
document-level dedup (operators/dedup.py) cannot see: repeated lines
inside one document (navigation chrome, scraped pagination) and
boilerplate lines shared across many documents (cookie banners,
footers). The standard cleaning pass drops both; this is its
deterministic Spark formulation.

Contract (deterministic, order-preserving):
1. Split text on newlines; a line's identity is its normalized form
   (lower + full ASCII-whitespace trim — ``functions.text.trim_ws`` —
   so a tab-padded boilerplate line and its space-padded twin collapse
   to ONE form; web nav/footer lines arrive with every padding).
2. WITHIN a document: keep only the FIRST occurrence of each normalized
   line (by line position).
3. ACROSS the corpus: drop every line whose normalized form occurs in
   more than ``max_line_df`` DISTINCT documents (the boilerplate
   threshold), unless the form is empty (blank separators stay).
4. Reassemble surviving lines in original order.

Scale shape (100 TB): the main branch is ONE text scan -> explode ->
(doc, line-form) window -> broadcast boilerplate join -> one
groupBy(doc) rebuild (the per-doc input line count rides the explode,
so there is no second per-doc count scan and no final outer join). The
boilerplate-frequency branch is a second pruned scan collapsed to
scan -> explode -> filter -> map-side-distinct aggregate (no window:
countDistinct(doc) is invariant under the first-occurrence dedup, and
Catalyst's pushdown specializes the branch anyway, so sharing the main
branch's exchange is not structurally possible); its output — the
distinct boilerplate form set, compact by construction — broadcasts.
No UDFs; the only higher-order call (rebuilding the line array) runs
once per document over an already-aggregated array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import trim_ws


def line_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style within-document repetition signals ->
    (id_col, n_lines, dup_line_frac, dup_line_char_frac).

    Over NON-EMPTY normalized lines of each document:
    dup_line_frac       = (lines - distinct lines) / lines
    dup_line_char_frac  = chars in repeat occurrences / total chars
    (a line form occurring c times with L chars contributes (c-1)*L).
    Documents with no non-empty lines report (0, 0.0, 0.0).

    Scale shape: one explode, one (doc, line-form) aggregate, one
    per-doc aggregate — the same shuffle key layout as clean_lines'
    main branch; no window, no UDF. The standard repetition filters of
    the Gopher/MassiveText quality rules, kept deterministic and
    SQL-mirrorable for the oracle.
    """
    lines = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("line"),
        )
        .withColumn("form", F.lower(trim_ws(F.col("line"))))
        .where(F.col("form") != "")
    )
    per_form = lines.groupBy("id", "form").agg(
        F.count("*").alias("_c"), F.length(F.first("form")).alias("_len")
    )
    per_doc = per_form.groupBy("id").agg(
        F.sum("_c").alias("n_lines"),
        (F.sum("_c") - F.count("*")).alias("_dups"),
        F.sum(F.col("_c") * F.col("_len")).alias("_chars"),
        F.sum((F.col("_c") - 1) * F.col("_len")).alias("_dup_chars"),
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
        F.round(
            F.coalesce(F.col("_dups") / F.col("n_lines"), F.lit(0.0)), 6
        ).alias("dup_line_frac"),
        F.round(
            F.coalesce(F.col("_dup_chars") / F.col("_chars"), F.lit(0.0)), 6
        ).alias("dup_line_char_frac"),
    )


def clean_lines(
    docs: DataFrame,
    max_line_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_stats: bool = False,
) -> DataFrame:
    """-> (id_col, text_clean, n_lines_in, n_lines_kept).

    ``max_line_df``: a normalized line occurring in MORE than this many
    distinct documents is boilerplate and is removed everywhere.

    ``with_stats``: additionally emit the ``line_stats`` Gopher
    repetition signals (``dup_line_frac``, ``dup_line_char_frac``,
    computed over the RAW pre-cleaning lines — post-cleaning they are 0
    by construction) for FREE: the per-(doc, form) occurrence count
    rides the existing first-occurrence window (same partition+order
    spec, so one Window operator, zero extra shuffles or scans), and
    the per-doc reductions ride the existing rebuild aggregate. This is
    how the corpus pipeline feeds its ``high_line_repetition`` rule
    without a third text scan.
    """
    # ONE scan: the line count rides the explode as a per-row constant,
    # so no second pass over the (dominant at corpus scale) text column
    # and no final per-doc join is needed — every doc has >= 1 exploded
    # row (split always yields at least one element), so the single
    # groupBy(id) below sees every doc, including ones whose lines all
    # drop as boilerplate.
    split_c = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    raw = docs.select(
        F.col(id_col).alias("id"),
        F.size(split_c).alias("n_in"),
        F.posexplode(split_c).alias("pos", "line"),
    ).withColumn("form", F.lower(trim_ws(F.col("line"))))

    # within-doc first occurrence (step 2). When stats ride along, the
    # per-(doc, form) occurrence count uses the SAME partition+order
    # spec (full-frame window), so Catalyst plans ONE Window operator —
    # after the rk==1 filter each non-empty form survives exactly once
    # carrying its total count, which is all line_stats needs.
    first_w = W.partitionBy("id", "form").orderBy("pos")
    lines = raw.withColumn("_rk", F.row_number().over(first_w))
    if with_stats:
        cnt_w = first_w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        lines = lines.withColumn("_cnt", F.count("*").over(cnt_w))
    lines = lines.where((F.col("_rk") == 1) | (F.col("form") == ""))

    # corpus-wide document frequency per form (step 3), computed from
    # the RAW explode: countDistinct(id) is invariant under the
    # first-occurrence dedup, and basing this branch on `raw` lets
    # Catalyst prune it to scan -> explode -> filter -> two-level
    # aggregate (no window/sort) with map-side (form, id) collapse —
    # the branch shuffles only distinct (form, id) pairs.
    ldf = (
        raw.where(F.col("form") != "")
        .groupBy("form")
        .agg(F.countDistinct("id").alias("_df"))
        .where(F.col("_df") > F.lit(max_line_df))
        .select("form", F.lit(True).alias("_boiler"))
    )
    # boilerplate lines stay in the frame as NULLed entries (collect_list
    # skips nulls) so ONE groupBy(id) rebuilds every doc — no separate
    # per-doc count frame, no outer join
    stat_cols = []
    if with_stats:
        # each surviving non-empty form appears exactly once (rk==1)
        # with its in-doc occurrence total _cnt — the line_stats inputs
        ne = F.col("form") != ""
        stat_cols = [
            F.when(ne, F.col("_cnt")).otherwise(F.lit(0)).alias("_sc"),
            F.when(ne, F.col("_cnt") * F.length("form"))
            .otherwise(F.lit(0))
            .alias("_schars"),
            F.when(ne, (F.col("_cnt") - 1) * F.length("form"))
            .otherwise(F.lit(0))
            .alias("_sdup_chars"),
            F.when(ne, F.lit(1)).otherwise(F.lit(0)).alias("_sforms"),
        ]
    flagged = lines.join(ldf, "form", "left").select(
        "id",
        "n_in",
        F.when(F.col("_boiler").isNull(), F.struct("pos", "line")).alias(
            "_kept"
        ),
        *stat_cols,
    )
    stat_aggs = []
    if with_stats:
        stat_aggs = [
            F.sum("_sc").alias("_n_ne"),
            F.sum("_sforms").alias("_n_forms"),
            F.sum("_schars").alias("_chars"),
            F.sum("_sdup_chars").alias("_dup_chars"),
        ]
    rebuilt = flagged.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list("_kept")), lambda s: s["line"]
            ),
        ).alias("text_clean"),
        F.first("n_in").alias("n_lines_in"),
        F.count("_kept").alias("n_lines_kept"),
        *stat_aggs,
    )
    out_stats = []
    if with_stats:
        # identical rounding convention to line_stats so the oracle and
        # the rule threshold compare the same 6-decimal value
        # explicit zero-guards (not coalesce-after-divide): a doc with no
        # non-empty lines divides by 0, which raises under ANSI mode
        out_stats = [
            F.round(
                F.when(
                    F.col("_n_ne") > 0,
                    (F.col("_n_ne") - F.col("_n_forms")) / F.col("_n_ne"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.when(
                    F.col("_chars") > 0, F.col("_dup_chars") / F.col("_chars")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_line_char_frac"),
        ]
    return rebuilt.select(
        F.col("id").alias(id_col),
        "text_clean",
        "n_lines_in",
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
        *out_stats,
    )
