"""Driver-contract smoke tests for __spark_entry__ (full oracle comparison
lives in tools/check_oracle.py — run it at sf0.01 before shipping)."""

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


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
