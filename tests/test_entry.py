"""Driver-contract smoke tests (entry / queries / oracle_sql shape)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 5  # one per quantile
    assert "factor_quantile" in df.columns


def test_every_query_has_matching_oracle_keys():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 17


def test_all_queries_return_rows_at_smallest_sf(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() > 0, name
