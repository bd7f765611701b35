"""Persistent-override application (Q7).

Analog of the reference's manual/persistent matches, which are applied
*before* the cascade and always win (reference
matching_script.py:469-517 pre-applied manual matches;
backend/services/import_persistence.py:4-101 replay of saved solutions
keyed by stable ids, unique on (sloid, osm_node_id, problem_type)).

Spark shape: a left join against a (small) override table, keyed by the
stable image_id — broadcast when it fits, which at 0.1% override rate it
does even at 10^9 rows of overrides? No: at 10^12 x 0.1% the override
table is 10^9 rows -> shuffled hash join co-partitioned on image_id.
We broadcast below a row-count threshold, else plain join and let AQE
pick the strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_MAX_ROWS = 5_000_000


def apply_overrides(decisions: DataFrame, overrides: DataFrame | None) -> DataFrame:
    """Override forced_decision wins; rule becomes 'override', severity 1."""
    if overrides is None:
        return decisions.withColumn("overridden", F.lit(False))
    ov = overrides.select(
        F.col("image_id").alias("_ov_image_id"),
        F.col("forced_decision").alias("_ov_decision"),
    ).dropDuplicates(["_ov_image_id"])
    # Broadcast below the row threshold (one eager count of the small
    # side — override tables are curated, counting them is cheap); above
    # it, plain join: AQE picks shuffled-hash co-partitioned on image_id.
    if ov.count() <= BROADCAST_MAX_ROWS:
        ov = F.broadcast(ov)
    joined = decisions.join(
        ov, decisions["image_id"] == ov["_ov_image_id"], "left"
    )
    forced = F.col("_ov_decision").isNotNull()
    return (
        joined.withColumn(
            "decision", F.when(forced, F.col("_ov_decision")).otherwise(F.col("decision"))
        )
        .withColumn("rule", F.when(forced, F.lit("override")).otherwise(F.col("rule")))
        .withColumn("severity", F.when(forced, F.lit(1)).otherwise(F.col("severity")))
        .withColumn(
            "reasons",
            F.when(
                forced, F.concat(F.array(F.lit("override")), F.col("reasons"))
            ).otherwise(F.col("reasons")),
        )
        .withColumn("overridden", forced)
        .drop("_ov_image_id", "_ov_decision")
    )
