"""__spark_entry__ contract sanity (the driver's smoke check, locally)."""

import __spark_entry__ as m


def test_queries_and_oracles_consistent():
    qs = m.queries()
    os_ = m.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_plans_md_covers_registry():
    """PLANS.md staleness guard (VERDICT r6 #4: the audit silently
    shipped 56/57 rows after a late-landing query): every registry
    query must have a table row in the committed PLANS.md."""
    import os
    import re

    path = os.path.join(os.path.dirname(os.path.abspath(m.__file__)),
                        "PLANS.md")
    with open(path) as f:
        text = f.read()
    audited = set(re.findall(r"^\| (\w+)\s*†?\s*\|", text, re.M))
    missing = set(m.queries()) - audited
    assert not missing, f"PLANS.md missing rows for {sorted(missing)}"


def test_entry_runs(spark):
    df = m.entry(spark)
    assert df.count() > 0
    assert "conv_id" in df.columns and "session_id" in df.columns


def test_queries_run_sf0001(spark):
    for name, fn in m.queries().items():
        assert fn(spark, "/root/testdata/sf0.001").count() > 0, name


def test_spread_is_conditional(spark):
    """VERDICT r2: repartition() always shuffles — file count does not
    gate it — so the corpus spread must be a no-op (the SAME plan, no
    Exchange) whenever the scan already yields >= defaultParallelism
    partitions, and only round-robin under-partitioned inputs."""
    import __spark_entry__ as m

    p = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000).repartition(p + 4)
    assert m._spread(spark, wide) is wide  # pass-through, no new plan
    narrow = spark.range(10_000).coalesce(1)
    out = m._spread(spark, narrow)
    assert out.rdd.getNumPartitions() == p
