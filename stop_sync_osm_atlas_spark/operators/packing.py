"""Sequence packing: assemble documents into fixed-token-budget bins.

The training-batch assembly step of an LLM data pipeline (what T5-style
pretraining calls example packing): documents in a deterministic order
are chunked by cumulative token count, so each bin holds ~budget
tokens. Spark shape: an exclusive-prefix window sum per partition key —
packing is embarrassingly parallel ACROSS keys (lang, shard, source)
and sequential within one, which is exactly the window contract; no
driver-side loop, no UDF. A doc larger than the budget gets its own
bin(s) boundary — cumulative chunking never splits a document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def pack_bins(
    docs: DataFrame,
    token_col: Column,
    budget: int = 512,
    part_col: str = "lang",
    order_col: str = "doc_id",
) -> DataFrame:
    """-> (part_col, bin, n_docs, total_tokens, first_doc, last_doc).

    bin = floor(exclusive-prefix-sum(tokens) / budget) within each
    partition key, docs ordered by ``order_col`` — deterministic,
    SQL-identical, one shuffle on the partition key.
    """
    w = (
        W.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    run = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    binned = docs.select(
        F.col(part_col),
        F.col(order_col),
        token_col.alias("_tok"),
        F.floor(run / F.lit(budget)).cast("long").alias("bin"),
    )
    return binned.groupBy(part_col, "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("_tok").alias("total_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )
