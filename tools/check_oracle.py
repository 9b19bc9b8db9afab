#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, then compares:
  - row count,
  - column names (sorted),
  - values: order-insensitive — both results sorted by all columns,
    numeric cells compared exactly after string normalization (mirroring a
    value-hash) and again with a 1e-9 tolerance so we can tell real breaks
    from float-ulp noise.

Usage: python tools/check_oracle.py [query ...] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from bigdata_lab02_spark.session import get_spark  # noqa: E402
from bigdata_lab02_spark.sources.tables import TABLE_NAMES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-hash stand-in: repr of the double
        return repr(v)
    return str(v)


def to_rows(columns, records):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in records)


def close_enough(a_rows, b_rows):
    """Secondary tolerance compare: are mismatches just float noise?"""
    if len(a_rows) != len(b_rows):
        return False, "row count"
    worst = 0.0
    for ra, rb in zip(a_rows, b_rows):
        if len(ra) != len(rb):
            return False, "arity"
        for ca, cb in zip(ra, rb):
            if ca == cb:
                continue
            try:
                fa, fb = float(ca), float(cb)
            except ValueError:
                return False, f"non-numeric diff: {ca!r} vs {cb!r}"
            d = abs(fa - fb) / max(1.0, abs(fa), abs(fb))
            worst = max(worst, d)
            if d > 1e-9:
                return False, f"numeric diff {fa} vs {fb} (rel {d:.2e})"
    return True, f"worst rel diff {worst:.2e}"


def run_check(names=None, sf_dir="/root/testdata/sf0.01", spark=None, quiet=False):
    """Compare each named query against its DuckDB oracle at sf_dir.

    Returns a list of (name, status, detail, seconds) tuples with status in
    {"PASS", "TOL", "SKIP", "FAIL"}. Reused by the pytest gate over the
    ROTATED_OUT registry overflow (tests/test_entry_contract.py)."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if spark is None:
        spark = get_spark(app_name="check_oracle")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or list(qs)

    results = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srecs = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results.append((name, "FAIL",
                            f"spark error: {type(e).__name__}: {str(e).splitlines()[0][:200]}",
                            time.time() - t0))
            if not quiet:
                print(f"FAIL {name}: {results[-1][2]}")
            continue
        if name not in oracles:
            results.append((name, "SKIP",
                            f"no oracle (rows-only check): {len(srecs)} rows",
                            time.time() - t0))
            if not quiet:
                print(f"SKIP {name}: {results[-1][2]} [{results[-1][3]:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orecs = rel.fetchall()
        except Exception as e:
            results.append((name, "FAIL",
                            f"duckdb error: {type(e).__name__}: {str(e).splitlines()[0][:200]}",
                            time.time() - t0))
            if not quiet:
                print(f"FAIL {name}: {results[-1][2]}")
            continue

        problems = []
        if len(srecs) != len(orecs):
            problems.append(f"rows {len(srecs)} vs {len(orecs)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        status = "PASS"
        detail = f"{len(srecs)} rows"
        if not problems:
            a, b = to_rows(scols, srecs), to_rows(ocols, orecs)
            if a != b:
                ok, why = close_enough(a, b)
                if ok:
                    status, detail = "TOL", f"{len(srecs)} rows; hash would differ: {why}"
                else:
                    status, detail = "FAIL", why
                    for ra, rb in zip(a, b):
                        if ra != rb:
                            detail += f" | first diff:\n  spark {ra}\n  duck  {rb}"
                            break
        else:
            status, detail = "FAIL", "; ".join(problems)
        results.append((name, status, detail, time.time() - t0))
        if not quiet:
            print(f"{status} {name}: {detail} [{time.time()-t0:.1f}s]")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--times-out",
        default="tools/oracle_times.json",
        help="where to record per-query wall seconds in driver-window "
        "order (pass '' to skip)",
    )
    args = ap.parse_args()
    results = run_check(names=args.queries or None, sf_dir=args.sf_dir)
    n_fail = sum(1 for _, s, _, _ in results if s == "FAIL")
    n_pass = sum(1 for _, s, _, _ in results if s in ("PASS", "TOL"))
    print(f"\n{n_pass} pass, {n_fail} fail of {len(results)}")
    if args.times_out and not args.queries:
        # Triage record for the driver's 50-row window (ADVICE r4): if a
        # future CORRECTNESS round drops rows, these per-query walls say
        # whether a wall-clock cap (not the measured positional one) could
        # explain which rows fell off.
        import json

        window = list(entrymod.queries())[: entrymod.DRIVER_ROW_CAP]
        times = {n: round(t, 2) for n, _, _, t in results}
        Path(args.times_out).write_text(
            json.dumps(
                {
                    "sf_dir": args.sf_dir,
                    "window_order": window,
                    "seconds": times,
                    "window_total_sec": round(
                        sum(times.get(n, 0.0) for n in window), 1
                    ),
                },
                indent=1,
            )
        )
        print(f"per-query walls -> {args.times_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
