#!/usr/bin/env python
"""Measure 1×/4× walls for FAMILY members added AFTER the last full
`scale_stress.py` run and MERGE their rows into tools/scale_stress.json
(idempotent: named gates are re-measured and replaced). The full tool
rebuilds every phase (~25 min); this one rebuilds only the 4× corpus and
times the named gates — the per-round incremental path.

Usage: python tools/stress_merge.py <gate> [...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from bigdata_lab02_spark.session import get_spark  # noqa: E402
from tools.scale_stress import SRC, make_scaled  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: stress_merge.py <gate> [...]")
    out = ROOT / "tools" / "scale_stress.json"
    payload = json.loads(out.read_text())
    spark = get_spark(app_name="stress_merge")
    qs = entrymod.queries()
    spark.read.parquet(f"{SRC}/lineitem.parquet").count()

    def timed(name: str, sf_dir: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    d = tempfile.mkdtemp(prefix="sf0.4m_")
    try:
        make_scaled(d)
        rows = [r for r in payload["rows"] if r[0] not in names]
        for name in names:
            base = timed(name, SRC)
            big = timed(name, d)
            rows.append([name, round(base, 2), round(big, 2)])
            print(f"{name}: sf0.1 {base:.2f}s -> 4x {big:.2f}s "
                  f"({big / base:.1f}x wall at 4x data)")
        payload["rows"] = rows
        out.write_text(json.dumps(payload, indent=1))
        print(f"merged {len(names)} rows -> {out}")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
