"""End-to-end pipeline assembly: read -> cascade -> checkpointed sinks.

The Spark recast of the reference's final_pipeline + import_to_database
(reference matching_script.py:126-594 -> one DataFrame DAG;
import_data_db.py:385-976 truncate-and-insert -> checkpointed
partitioned writes + metrics rollup).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..operators.cascade import metrics_rollup, run_cascade
from ..operators.rules import RuleConfig
from ..schemas import PAIRS_SCHEMA
from ..sources.checkpoint import CheckpointedWriter
from ..sources.io import write_table


def load_pairs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAIRS_SCHEMA).parquet(path)


def load_overrides(spark: SparkSession, path: str | None) -> DataFrame | None:
    if path is None:
        return None
    return spark.read.parquet(path)


def run_pipeline(
    spark: SparkSession,
    pairs_path: str,
    out_root: str,
    overrides_path: str | None = None,
    cfg: RuleConfig | None = None,
    neardup_kwargs: dict | None = None,
    run_id: str = "run0",
    n_groups: int = 8,
    use_model_udfs: bool = False,
    model_corpus: "pd.DataFrame | None" = None,
) -> dict:
    """Run the full decision engine with checkpointed writes.

    ``use_model_udfs``: switch langid/perplexity from the pure-Catalyst
    marker scorer to the Arrow-vectorized NB / char-bigram models
    (trained deterministically from ``model_corpus``:
    columns text, lang).
    """
    pairs = load_pairs(spark, pairs_path)
    overrides = load_overrides(spark, overrides_path)

    langid_udf = perplexity_udf = None
    if use_model_udfs:
        from ..functions.langid import langid_hashed_ngram_udf, train_langid_model
        from ..functions.perplexity import perplexity_udf as make_ppl, train_char_bigram

        assert model_corpus is not None, "model_corpus required for model UDFs"
        model = train_langid_model(
            list(model_corpus["text"]), list(model_corpus["lang"])
        )
        langid_udf = langid_hashed_ngram_udf(model)
        perplexity_udf = make_ppl(train_char_bigram(list(model_corpus["text"])))

    decisions = run_cascade(
        pairs,
        cfg=cfg,
        overrides=overrides,
        langid_udf=langid_udf,
        perplexity_udf=perplexity_udf,
        neardup_kwargs=neardup_kwargs,
    )

    writer = CheckpointedWriter(out_root, n_groups=n_groups)
    counts = writer.run(decisions)

    final = writer.read_all(spark)
    metrics = metrics_rollup(final, run_id=run_id)
    write_table(metrics, f"{out_root}/metrics", mode="overwrite")
    return {"group_counts": counts, "out_root": out_root}
