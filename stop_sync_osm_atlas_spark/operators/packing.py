"""Sequence packing: assemble documents into fixed-token-budget bins.

The training-batch assembly step of an LLM data pipeline (what T5-style
pretraining calls example packing): documents in a deterministic order
are chunked by cumulative token count, so each bin holds ~budget
tokens. Spark shape: an exclusive-prefix window sum per partition key —
packing is embarrassingly parallel ACROSS keys and sequential within
one, which is exactly the window contract; no driver-side loop, no UDF.
A doc larger than the budget gets its own bin(s) boundary — cumulative
chunking never splits a document.

KEY-CARDINALITY CONTRACT: the window serializes each partition key into
one task, so ``part_col`` must be high-cardinality relative to the
cluster. A Zipfian key like language is NOT (English alone is ~half a
web corpus = one straggler task). For low-cardinality keys pass
``shards > 1``: rows are salted into ``xxhash64(order_col) % shards``
sub-keys, packed independently per (key, shard), and bin ids are
renumbered globally per key by offsetting each shard with the cumulative
bin count of lower shards — bin ids stay collision-free and
deterministic, at the (documented, inherent-to-parallel-packing) cost
that docs pack in (shard, order_col) order rather than global order_col
order, and each shard's final partial bin stays partial.

Bin ids are monotone but NOT guaranteed dense in either path:
floor-of-cumulative-sum skips ids whenever one document exceeds the
budget (a 2000-token doc at budget 512 fills bin 0 and the next doc
starts bin 3 — bins 1-2 never exist). Consumers must group by the bin
VALUE, never iterate 0..max.
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
    shards: int = 1,
    shard_col: Column | None = None,
) -> DataFrame:
    """-> (part_col, bin, n_docs, total_tokens, first_doc, last_doc).

    bin = floor(exclusive-prefix-sum(tokens) / budget) within each
    partition key (and shard, when ``shards > 1`` — see the module
    docstring for the cardinality contract), docs ordered by
    ``order_col`` — deterministic, SQL-identical at shards=1, one
    shuffle on the partition key.

    ``shard_col``: expression overriding the default
    ``xxhash64(order_col) % shards`` salt (values must lie in
    [0, shards)). Lets a caller plant an engine-portable shard key
    (e.g. ``pmod(doc_id, shards)``) so the sharded renumbering path is
    reproducible in SQL oracles that lack xxhash64.
    """
    if budget < 1:
        # fail at plan build, not as a DIVIDE_BY_ZERO mid-job under ANSI
        raise ValueError(f"budget={budget} must be >= 1 token per bin")
    if shards <= 1:
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
    else:
        if shard_col is None:
            shard_col = F.pmod(F.xxhash64(F.col(order_col)), F.lit(shards))
        shard = shard_col.cast("int")
        w = (
            W.partitionBy(part_col, "_shard")
            .orderBy(order_col)
            .rowsBetween(W.unboundedPreceding, -1)
        )
        run = F.coalesce(F.sum("_tok").over(w), F.lit(0))
        local = docs.select(
            F.col(part_col),
            F.col(order_col),
            token_col.alias("_tok"),
            shard.alias("_shard"),
        ).withColumn("_lbin", F.floor(run / F.lit(budget)).cast("long"))
        # the windowed frame feeds TWO consumers (the per-shard bin
        # counts and the final probe) and Catalyst specializes shared
        # subtrees — without this the scan, the token expression, the
        # shuffle sort and the prefix window all run twice (diamond
        # rule). Lazy localCheckpoint: both consumers read one RDD,
        # blocks freed by the ContextCleaner.
        local = local.localCheckpoint(eager=False)
        # global renumbering: offset each shard by the cumulative
        # bin count of lower shards (a <= shards-row aggregate per key,
        # broadcast back — never a full-data second shuffle)
        per_shard = local.groupBy(part_col, "_shard").agg(
            (F.max("_lbin") + 1).alias("_nbins")
        )
        off_w = (
            W.partitionBy(part_col)
            .orderBy("_shard")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        offsets = per_shard.withColumn(
            "_off", F.coalesce(F.sum("_nbins").over(off_w), F.lit(0))
        ).select(part_col, "_shard", "_off")
        binned = local.join(
            F.broadcast(offsets), [part_col, "_shard"]
        ).select(
            F.col(part_col),
            F.col(order_col),
            "_tok",
            (F.col("_lbin") + F.col("_off")).alias("bin"),
        )
    return binned.groupBy(part_col, "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("_tok").alias("total_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )
