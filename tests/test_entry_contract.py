"""Driver-contract smoke tests for __spark_entry__ (full oracle comparison
lives in tools/check_oracle.py — run it at sf0.01 before shipping)."""

import json
import re
from pathlib import Path

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _latest_correctness():
    repo = Path(__file__).resolve().parent.parent
    files = sorted(repo.glob("CORRECTNESS_r*.json"))
    if not files:
        return None, None
    latest = files[-1]
    round_no = int(re.search(r"r(\d+)", latest.name).group(1))
    return set(json.load(latest.open())), round_no


def test_driver_window_queries_recorded():
    """The round driver records correctness rows for exactly the first
    DRIVER_ROW_CAP (50) entries of _QUERIES, positionally (measured in
    rounds 2 and 3 — it is NOT a wall-clock drop). Every query inside that
    window that was registered by the latest driver run MUST have a row;
    absence means the registry order regressed or the driver changed
    behavior — either way a hard failure, with the right diagnosis."""
    recorded, round_no = _latest_correctness()
    if recorded is None:
        return
    if round_no < entrymod.ORDERING_SINCE:
        # Latest driver file predates the current registry ordering; the
        # positional expectation only holds from ORDERING_SINCE onward.
        return
    window = list(entrymod.queries())[: entrymod.DRIVER_ROW_CAP]
    known = entrymod.REGISTERED_SINCE  # name -> round first registered
    expected = {q for q in window if known.get(q, 99) <= round_no}
    missing = expected - recorded
    assert not missing, (
        f"queries inside the driver's first-{entrymod.DRIVER_ROW_CAP} window, "
        f"registered by round {round_no}, but absent from CORRECTNESS_r"
        f"{round_no:02d}: {sorted(missing)} — positional cap violated or "
        "driver behavior changed; check _QUERIES ordering"
    )


def test_registry_overflow_is_declared():
    """Entries past position DRIVER_ROW_CAP never get a driver row. That
    must be an explicit decision: the overflow set must equal ROTATED_OUT
    exactly. A new query accidentally appended past position 50 (round 3's
    silent failure mode) fails here; a stale ROTATED_OUT entry that moved
    back into the window fails too."""
    names = list(entrymod.queries())
    overflow = set(names[entrymod.DRIVER_ROW_CAP:])
    assert overflow == entrymod.ROTATED_OUT, (
        f"undeclared overflow past position {entrymod.DRIVER_ROW_CAP}: "
        f"{sorted(overflow - entrymod.ROTATED_OUT)}; stale ROTATED_OUT "
        f"entries now inside the window: "
        f"{sorted(entrymod.ROTATED_OUT - overflow)}"
    )


def test_rotated_out_queries_still_pass_oracle(spark):
    """Rotated-out queries lose their driver row but must not rot: re-run
    the full Spark-vs-DuckDB oracle compare over ROTATED_OUT at sf0.001
    (fast) every pytest run."""
    import tools.check_oracle as co

    names = [n for n in entrymod.queries() if n in entrymod.ROTATED_OUT]
    results = co.run_check(names=names, sf_dir=SF, spark=spark, quiet=True)
    bad = [(n, s, d) for n, s, d, _ in results if s == "FAIL"]
    assert not bad, f"rotated-out queries lost oracle parity: {bad}"


def test_queries_and_oracles_align():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)  # every oracle has a query
    missing = set(qs) - set(oracles)
    # only the declared iterative/non-SQL ops may lack an oracle
    assert missing == entrymod.ROWS_ONLY, f"undeclared rows-only queries: {missing}"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"nation", "revenue", "n_items"} == set(df.columns)


def test_each_query_runs_smoke(spark):
    # sf0.001 smoke: every query must at least plan + execute
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        df.limit(5).collect()
