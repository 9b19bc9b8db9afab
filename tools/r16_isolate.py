#!/usr/bin/env python
"""Isolated per-gate walls for the r16 optimization round (guide §1.4):
runs the named gates through the noop sink, N reps each, one fresh
session, prints JSON. Usage: r16_isolate.py q1 q2 ... [--reps N]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_lab02_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r16_isolate")
    # warmup (session init + codegen + parquet footers)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in args:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}")
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"r16_isolate:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        out[name] = walls
    print(json.dumps(out))


if __name__ == "__main__":
    main()
