#!/usr/bin/env python
"""Interleaved A/B of the r16 scan-spread on named gates (guide §1):
for each gate, alternate spread-OFF and spread-ON constructions in ONE
session ([off, on] x reps), timing each through the noop sink so host
drift hits both arms equally. Usage: r16_ab_spread.py q1 q2 ... [--reps=N]
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
    spark = get_spark(app_name="r16_ab_spread")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()
    qs = entrymod.queries()
    real_spread = entrymod._spread
    out: dict[str, dict[str, list[float]]] = {}
    for name in args:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}")
        walls: dict[str, list[float]] = {"off": [], "on": []}
        for rep in range(reps):
            # alternate arm order per rep (r16 session 2: the first
            # arm of a pair pays a systematic penalty on this host —
            # a fixed order over-credits whichever arm runs second)
            order = ("off", "on") if rep % 2 == 0 else ("on", "off")
            for arm in order:
                entrymod._spread = (lambda df: df) if arm == "off" else real_spread
                spark.sparkContext.setJobDescription(f"r16_ab:{name}:{arm}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                walls[arm].append(round(time.time() - t0, 3))
        entrymod._spread = real_spread
        out[name] = walls
        print(f"# {name}: off={walls['off']} on={walls['on']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
