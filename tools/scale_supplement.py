#!/usr/bin/env python
"""Append 1x/4x family rows for gates added AFTER a scale_stress run
started (r14): times each named gate at sf0.1 and at a fresh 4x replica
corpus, and merges the rows into tools/scale_stress.json so
scaling_audit renders them with the rest of the family table. Usage:
    python tools/scale_supplement.py gate [gate ...]
(image_captions stays corpus-independent-fixture-sized, the media-gate
convention — it has no 4x row, like image_dedup/audio_dedup.)"""
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

import __spark_entry__ as entrymod  # noqa: E402
from tools.scale_stress import SRC, make_scaled  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: scale_supplement.py gate [gate ...]")
    spark = get_spark(app_name="scale_supplement")
    qs = entrymod.queries()
    spark.read.parquet(f"{SRC}/lineitem.parquet").count()

    def timed(name: str, sf_dir: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    out = ROOT / "tools" / "scale_stress.json"
    payload = json.loads(out.read_text())
    have = {r[0] for r in payload.get("rows", [])}
    d = tempfile.mkdtemp(prefix="sf0.4sup_")
    try:
        make_scaled(d)
        for name in names:
            base = timed(name, SRC)
            big = timed(name, d)
            row = [name, round(base, 2), round(big, 2)]
            if name in have:
                payload["rows"] = [
                    r if r[0] != name else row for r in payload["rows"]
                ]
            else:
                payload["rows"].append(row)
            out.write_text(json.dumps(payload, indent=1))
            print(f"{name}: sf0.1 {base:.2f}s -> 4x {big:.2f}s "
                  f"({big / base:.1f}x wall at 4x data)")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
