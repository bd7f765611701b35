"""PySpark-native quality-filter engine.

A from-scratch re-expression of the decision semantics of
``openTdataCH/stop_sync_osm_atlas`` (staged hit-first matching cascade +
rule-based problem detection, see /root/reference, SURVEY.md) as a
keep/drop + scrub engine over image+caption tables, built Spark-first:
DataFrame/SQL logical plans, Catalyst optimization, Arrow-vectorized
pandas UDFs only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"
