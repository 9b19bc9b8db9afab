"""Physical-plan audits.

``plan_report(df)`` extracts the scale-relevant facts from the formatted
physical plan: exchanges (shuffles), broadcast joins, sort-merge joins,
pushed filters, scanned schema width, codegen coverage. Tests and the
bench harness assert on these — a query that silently regresses from
broadcast-hash to sort-merge, or stops pushing its filter into the scan,
fails loudly here rather than 10× slower at the next scale factor.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_shuffle_hash_joins: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    wholestage_ids: int = 0
    has_take_ordered: bool = False
    raw: str = ""


def plan_report(df: DataFrame) -> PlanReport:
    spark = df.sparkSession
    jvm = spark._jvm  # noqa: SLF001
    plan = jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )
    r = PlanReport(raw=plan)
    # formatted mode prints each node twice (tree + numbered details);
    # count only the numbered detail headers "(n) NodeName"
    def n_nodes(name: str) -> int:
        return len(re.findall(rf"^\(\d+\) {name}\b", plan, re.MULTILINE))

    r.n_exchanges = n_nodes("Exchange")
    r.n_broadcast_joins = n_nodes("BroadcastHashJoin")
    r.n_sortmerge_joins = n_nodes("SortMergeJoin")
    r.n_shuffle_hash_joins = n_nodes("ShuffledHashJoin")
    r.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    r.read_schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    r.wholestage_ids = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    r.has_take_ordered = "TakeOrderedAndProject" in plan
    return r


def assert_pushdown(df: DataFrame, fragment: str) -> PlanReport:
    """Assert some filter fragment reached the scan's PushedFilters."""
    r = plan_report(df)
    joined = ";".join(r.pushed_filters)
    assert fragment.lower() in joined.lower(), (
        f"filter {fragment!r} not pushed down; PushedFilters={r.pushed_filters}"
    )
    return r
