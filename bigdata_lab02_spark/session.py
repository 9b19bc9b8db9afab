"""SparkSession factory.

One place to encode the engine's execution profile. The defaults target the
test environment (single-host ``local[N]``) but every setting is chosen to
also be the right call on a large multi-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic join
  strategy switches) — the 100 TB safety net.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real cluster
  AQE's coalescing makes the static number much less load-bearing.
- Arrow enabled so the pandas-UDF slow path is batch-vectorized, never
  row-at-a-time pickling.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-location-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bigdata_lab02_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``getOrCreate`` semantics: if a session already exists (e.g. the driver
    harness created one and passed it to ``entry``), its conf wins.
    """
    cpus = cpus or _DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/bigdata_lab02_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# ---------------------------------------------------------------- r17
# The documented PRODUCTION profile (VERDICT r16 item 9; guide §9, §2.3,
# §3.1, §6). NON-DEFAULT by design: none of these values is applied by
# get_spark() unless a caller opts in (extra_conf=cluster_profile()),
# because every one of them is either inert or unmeasurable at the test
# environment's local[32]/sf0.1 scale — shipping them as defaults would
# be config-twiddling the bench (round rule), and the r16 receipts show
# the two measurable candidates (zstd shuffle codec,
# preferSortMergeJoin) change nothing locally. Justifications:
#
# - spark.io.compression.codec=zstd (guide §2.3): markedly better
#   shuffle/spill ratio for a bit more CPU; pays at network-bound
#   multi-TB shuffles, pure overhead is bounded. STATIC conf — must be
#   set at session build, cannot be A/B'd inside a running local JVM.
# - spark.sql.join.preferSortMergeJoin=false (guide §3.1): lets the
#   planner pick shuffled-hash when its size conditions hold (no sort
#   of either side). Local receipts: the relational plans are already
#   all-broadcast (PLANS.md) and stay byte-identical; the one local
#   effect found is semantic_dedup_incremental's keep-flag left join
#   flipping SMJ->SHJ — the key's documented purpose, pinned as the
#   ONLY permitted delta by tests/test_session_profile.py. Non-default
#   here, so the bench never sees it.
# - spark.sql.files.maxPartitionBytes=1g + openCostInBytes (guide §6):
#   bigger scan splits for large sequential reads; cuts the map-task
#   count feeding every shuffle (§2.2). Inert on the single-row-group
#   local testdata (one split either way).
# - spark.sql.adaptive.advisoryPartitionSizeInBytes=256m (guide §2.2):
#   AQE coalescing target sized for 100 MB-1 GB reduce partitions at
#   cluster scale; local exchanges move ~MBs and coalesce to 1-2
#   partitions under either value.
# - spark.sql.parquet.compression.codec=zstd (guide §6): output codec
#   for the persisted layouts; smaller than snappy at similar read
#   speed. Affects only bytes on disk, never plans/results.
# - spark.executor.memoryOverhead (guide §5): sized for the Arrow
#   mapInPandas codec tiers (media decode batches), which live in
#   Python/Arrow memory the JVM heap fraction does not cover; the
#   default 10% is the documented OOM-137 trap for PySpark.
# - spark.speculation (guide §2.6): re-launch stragglers on slow NODES
#   (cloud-heterogeneous fleets); meaningless on one host.
#
# §2.6 build OVERLAP (thread-pool back-fill of independent index
# builds, e.g. hybrid_retrieval_persisted's BM25 + IVF legs) stays a
# documented pattern rather than code: the r16 both-order A/B measured
# it a WASH at local[32] (OPTIMIZATION_r16.md), so wiring it in would
# ship an unmeasurable branch; at cluster scale submit the two
# persist() calls from a 2-thread pool exactly as the guide shows.
CLUSTER_PROFILE: dict[str, str] = {
    "spark.io.compression.codec": "zstd",
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.files.maxPartitionBytes": str(1 << 30),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.executor.memoryOverhead": "6g",
    "spark.speculation": "true",
}

# The subset of CLUSTER_PROFILE that is runtime-settable SQL conf — the
# part a local test CAN toggle on a live session to prove plan
# inertness (the static entries above are JVM-build-time).
CLUSTER_PROFILE_DYNAMIC: dict[str, str] = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.files.maxPartitionBytes": str(1 << 30),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    "spark.sql.parquet.compression.codec": "zstd",
}


def cluster_profile() -> dict[str, str]:
    """The production (multi-executor, 100 TB-scale) conf overlay —
    pass as ``get_spark(extra_conf=cluster_profile())``. See the
    CLUSTER_PROFILE comment block for the per-key justification and
    why it is NOT the local default."""
    return dict(CLUSTER_PROFILE)


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable conf to a session we didn't build
    (the driver harness hands us one). Only touches dynamic SQL confs."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep whatever it has
    return spark
