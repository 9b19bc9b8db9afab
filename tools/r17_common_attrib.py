#!/usr/bin/env python
"""VERDICT r16 item 3: attribute the driver common17_norm_ratio lineage
(6.115 -> 7.636, two driver runs above the 6.3 trigger) with a
drift-cancelling measurement.

Protocol: ONE session; for each rep, walk the common17 oracled queries
and time each query's Spark noop wall and its DuckDB oracle wall
back-to-back, ALTERNATING which side runs first per rep (the r16
order-bias correction: on this host the first arm of every interleaved
pair pays a systematic penalty, so a fixed order over-credits whichever
side runs second). The sum-ratio over min-of-reps walls is the same
quantity bench.py reports as common17_norm_ratio, measured with both
arms inside one drift window and the order bias cancelled.

Usage: r17_common_attrib.py [--reps=N] [--set=17|25]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from bigdata_lab02_spark.session import get_spark  # noqa: E402
from bigdata_lab02_spark.sources.tables import TABLE_NAMES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    reps = 4
    which = "17"
    explicit: list[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
        if a.startswith("--set="):
            which = a.split("=")[1]
        if a.startswith("--queries="):
            explicit = a.split("=", 1)[1].split(",")
    names = explicit or (bench.COMMON17 if which == "17" else bench.COMMON25)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r17_common_attrib")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    names = [n for n in names if n in oracles]

    spark_w: dict[str, list[float]] = {n: [] for n in names}
    duck_w: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            fn = qs.get(name) or getattr(entrymod, f"q_{name}")

            def run_spark() -> None:
                spark.sparkContext.setJobDescription(
                    f"r17_attrib:{name}:rep{rep}"
                )
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                spark_w[name].append(round(time.time() - t0, 3))

            def run_duck() -> None:
                t0 = time.time()
                con.sql(oracles[name]).fetchall()
                duck_w[name].append(round(time.time() - t0, 3))

            # alternate which SIDE goes first per rep (order-bias fix)
            order = (run_spark, run_duck) if rep % 2 == 0 else (
                run_duck,
                run_spark,
            )
            for r in order:
                r()
        s_min = {n: min(spark_w[n]) for n in names}
        d_min = {n: min(duck_w[n]) for n in names}
        ratio = round(sum(s_min.values()) / sum(d_min.values()), 3)
        print(
            f"# rep {rep}: cumulative min-ratio common{which} = {ratio}",
            file=sys.stderr,
        )

    s_min = {n: min(spark_w[n]) for n in names}
    d_min = {n: min(duck_w[n]) for n in names}
    per_q = {
        n: round(s_min[n] / d_min[n], 2) if d_min[n] > 0 else None
        for n in names
    }
    print(
        json.dumps(
            {
                "set": ",".join(explicit) if explicit else which,
                "reps": reps,
                "sum_ratio_min": round(
                    sum(s_min.values()) / sum(d_min.values()), 3
                ),
                "spark_walls": spark_w,
                "duck_walls": duck_w,
                "per_query_min_ratio": per_q,
            }
        )
    )


if __name__ == "__main__":
    main()
