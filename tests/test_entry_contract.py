"""__spark_entry__ contract sanity (the driver's smoke check, locally)."""

import __spark_entry__ as m


def test_queries_and_oracles_consistent():
    qs = m.queries()
    os_ = m.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_entry_runs(spark):
    df = m.entry(spark)
    assert df.count() > 0
    assert "conv_id" in df.columns and "session_id" in df.columns


def test_queries_run_sf0001(spark):
    for name, fn in m.queries().items():
        assert fn(spark, "/root/testdata/sf0.001").count() > 0, name
