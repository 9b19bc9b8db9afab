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
    n_map_in_pandas: int = 0
    repeated_scans: int = 0
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
    r.n_map_in_pandas = n_nodes("MapInPandas")
    r.repeated_scans = _repeated_scans(plan)
    return r


def _repeated_scans(plan: str) -> int:
    """Count REPEATED leaf scans: the same source leaf (parquet scan /
    Range / LocalTableScan, identical arguments) appearing N>1 times in
    one compiled plan means an upstream subtree was inlined into N
    consumers — the re-inlining class that made ccnet_pipeline execute
    its dedup stage 16× and the r12 image gates re-decode 5× (VERDICT
    r12 item 2: both were found by eye; this counts them structurally).
    Returns Σ (occurrences − 1) over duplicated leaf signatures.

    ``Scan ExistingRDD`` leaves (localCheckpoint pins) are EXCLUDED:
    re-scanning a materialized RDD is the cheap, intended outcome of
    pinning — the defect is repeated *computation*, not repeated reads
    of a pinned table. Compile-time duplicates may still be deduped at
    runtime by AQE ReuseExchange when the branches are structurally
    identical; treat N>expected as a flag to audit, with the receipt
    (reuse assertion or pin) recorded where it's intentional."""
    from collections import Counter

    counts: Counter[str] = Counter()
    # formatted mode: detail blocks "(n) NodeName\nKey: val\n..." separated
    # by blank lines; leaf nodes carry their full source description there
    for block in plan.split("\n\n"):
        block = block.strip()
        m = re.match(r"\(\d+\) (Scan \S+|Range|LocalTableScan)", block)
        if not m or m.group(1) == "Scan ExistingRDD":
            continue
        # normalize expression ids (#123L) — duplicate subtrees get fresh
        # ids per copy, but the source they scan is what must match
        sig = m.group(1) + "|" + re.sub(r"#\d+[A-Za-z]*", "#", block.split("\n", 1)[-1])
        counts[sig] += 1
    return sum(c - 1 for c in counts.values())


def assert_pushdown(df: DataFrame, fragment: str) -> PlanReport:
    """Assert some filter fragment reached the scan's PushedFilters."""
    r = plan_report(df)
    joined = ";".join(r.pushed_filters)
    assert fragment.lower() in joined.lower(), (
        f"filter {fragment!r} not pushed down; PushedFilters={r.pushed_filters}"
    )
    return r
