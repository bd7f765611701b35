"""Whole-surface plan audit: every graded query, one invariant sweep.

SURVEY §2.11's mandate — no row-at-a-time Python UDFs anywhere in the
engine — has so far been enforced by targeted plan tests plus judge
spot-checks. This audit builds the physical plan of EVERY
``queries()`` entry at sf0.001 and asserts the invariant globally, so
a future operator can't smuggle a BatchEvalPython into an ungraded
corner. Arrow surfaces (ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas) are the sanctioned Python path and are allowed.

Note: some entries run bounded eager jobs while BUILDING (near-dup
node maps, model training collects, the streaming replay) — that is
their documented contract; the audit only inspects the final plan.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_no_row_at_a_time_python_in_any_graded_plan(spark):
    import __spark_entry__ as entry

    offenders = {}
    for name, fn in entry.queries().items():
        plan = _plan(fn(spark, SF))
        if "BatchEvalPython" in plan:
            offenders[name] = [
                ln for ln in plan.splitlines() if "BatchEvalPython" in ln
            ][:2]
    assert not offenders, offenders
