"""TF-IDF keyword extraction (text analysis for corpus curation).

Per-document top-k terms by tf * ln(N / df) — the standard cheap
signal for topic tagging, domain mixing, and dedup explainability in a
training-data pipeline. Pure Catalyst: one explode, two aggregations,
one window — no UDF, no driver state. Deterministic: score ties break
on the term string, so the SQL oracle reproduces rows exactly.

Scale shape (100 TB): the (doc, term) explode is the big intermediate
(bounded by total token count); df is the per-term document-frequency
aggregate — the full distinct-term table, deliberately NOT
broadcast-hinted (billions of terms on web text); the join is shuffled
on term and AQE demotes it to broadcast at runtime only when df
actually fits. The top-k window partitions by doc_id — no global sort,
no skewed keys beyond stopword-like terms, which the ln(N/df) weight
crushes anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import words


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """-> (doc_id, term, tfidf, rank): top-k terms per doc.

    tf = in-document term count; idf = ln(N / df) with df = number of
    documents containing the term; ties break (tfidf desc, term asc).

    ``n_docs``: pass the corpus document count when the caller already
    knows it; left None it is computed INSIDE the main job as a 1-row
    aggregate cross-joined (broadcast) into the scoring projection — no
    separate eager count job, so plan building stays side-effect-free
    and the query runs as a single job.
    """
    if n_docs is None:
        n_frame = docs.select(id_col).agg(
            F.count("*").cast("double").alias("_n_docs")
        )
    else:
        n_frame = None
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(words(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    # df = docs-containing-term = rows per term in tf. As a separate
    # aggregate + join, tf fed two consumers and Catalyst re-specialized
    # the token explode + aggregate per consumer (two Generate+Scan
    # chains in the old q52 plan). A window count over term computes the
    # SAME value on one frame: one explode chain, one exchange on term
    # instead of a second full chain + join, and plan building stays
    # job-free (a localCheckpoint here would run the shuffle map stages
    # eagerly under AQE — measured, and pinned by
    # test_tfidf_plan_building_runs_no_job). No per-term state is ever
    # collected, so the billions-of-terms scale contract is unchanged.
    joined = tf.withColumn("df", F.count("*").over(W.partitionBy("term")))
    if n_frame is not None:
        # 1-row aggregate rides the same job as a broadcast nested-loop
        # cross join — N is exact (counts token-less docs too) without a
        # driver-blocking pre-job.
        joined = joined.join(F.broadcast(n_frame))
        n_expr = F.col("_n_docs")
    else:
        n_expr = F.lit(float(n_docs))
    scored = joined.select(
        F.col("id").alias(id_col),
        "term",
        F.round(F.col("tf") * F.log(n_expr / F.col("df")), 6).alias("tfidf"),
    )
    win = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )
