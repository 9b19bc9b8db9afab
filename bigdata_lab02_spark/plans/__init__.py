"""Plan inspection helpers — the engine's 'is Catalyst doing what we
think' audit surface."""

from bigdata_lab02_spark.plans.audit import plan_report, assert_pushdown  # noqa: F401
