"""Cross-snapshot incremental dedup (operators/incremental.py) —
hand-computed expectations on a tiny corpus plus broadcast-path
parity and plan pins; the cross-engine twin is graded by the driver
gate (`dedup_incremental` query)."""

import pytest

from radarpipeline_spark.operators.incremental import (
    band_signature_index,
    incremental_dedup,
)

SIG = dict(n_hashes=8, bands=4)


@pytest.fixture(scope="module")
def snapshot(spark):
    """Existing corpus: two near-identical docs, one unique."""
    rows = [
        (10, "the quick brown fox jumps over the lazy dog today"),
        (11, "the quick brown fox jumps over the lazy dog tomorrow"),
        (12, "completely different content about spark shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def delta(spark):
    rows = [
        # byte-identical re-crawl of doc 10 -> exact_dup, exact_of=10
        (100, "the quick brown fox jumps over the lazy dog today"),
        # near-dup of the 10/11 family (one token changed) -> near_dup
        (101, "the quick brown fox jumps over the lazy dog yesterday"),
        # brand new -> unique
        (102, "unrelated text with entirely novel vocabulary here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(snapshot):
    return band_signature_index(snapshot, **SIG)


def test_index_grain(index, snapshot):
    rows = index.collect()
    # band grain: bands rows per doc, content_hash constant per doc
    assert len(rows) == 3 * SIG["bands"]
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, set()).add(r.content_hash)
    assert all(len(v) == 1 for v in per_doc.values())


def test_statuses(index, delta):
    out = {r.doc_id: r for r in incremental_dedup(delta, index, **SIG).collect()}
    assert len(out) == 3
    assert out[100].status == "exact_dup" and out[100].exact_of == 10
    # the exact re-crawl also shares every band bucket with doc 10
    assert out[100].n_cand >= 1
    assert out[101].status == "near_dup" and out[101].exact_of is None
    assert out[101].near_of in (10, 11) and out[101].n_cand >= 1
    assert out[102].status == "unique"
    assert out[102].exact_of is None and out[102].near_of is None
    assert out[102].n_cand == 0


def test_broadcast_parity_and_plan(index, delta):
    """broadcast_new=True is bit-identical AND actually broadcasts the
    delta side (the production no-index-shuffle path)."""
    plain = incremental_dedup(delta, index, **SIG)
    bcast = incremental_dedup(delta, index, broadcast_new=True, **SIG)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bcast.collect())
    )
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bucket_cap_drops_clique_but_exact_leg_survives(spark):
    """The boilerplate-clique valve (max_bucket_size): a bucket holding
    more index docs than the cap is dropped at BUILD time, so a delta
    doc similar only by boilerplate reports no near candidates — but a
    byte-identical re-crawl of a capped doc is STILL caught, because
    the exact content-hash leg does not ride the band buckets (the
    left-join keeps every doc's content_hash row in the index)."""
    clique = spark.createDataFrame(
        [(i, "terms of service apply here") for i in range(6)]
        + [(100, "entirely unrelated unique document text")],
        "doc_id long, text string",
    )
    idx_capped = band_signature_index(clique, max_bucket_size=3, **SIG)
    # the 6-doc clique's buckets exceed the cap -> only doc 100 keeps
    # band rows; all 7 docs keep their content_hash (NULL band rows)
    assert idx_capped.filter("band IS NOT NULL").select(
        "doc_id"
    ).distinct().count() == 1
    assert idx_capped.select("doc_id").distinct().count() == 7

    delta = spark.createDataFrame(
        [(200, "terms of service apply here")], "doc_id long, text string"
    )
    out = incremental_dedup(delta, idx_capped, **SIG).collect()[0]
    assert out.status == "exact_dup" and out.exact_of == 0
    assert out.n_cand == 0  # the clique bucket is gone from the band leg

    # uncapped control: the same delta doc sees the whole clique
    idx_full = band_signature_index(clique, max_bucket_size=None, **SIG)
    out_full = incremental_dedup(delta, idx_full, **SIG).collect()[0]
    assert out_full.n_cand == 6


def test_signature_params_roundtrip(spark, snapshot):
    """An index built in one 'snapshot run' agrees with delta-side
    signatures computed later: a doc deduped against itself is an
    exact dup with full band agreement."""
    idx = band_signature_index(snapshot, **SIG)
    out = {
        r.doc_id: r
        for r in incremental_dedup(snapshot, idx, **SIG).collect()
    }
    for doc_id, r in out.items():
        assert r.status == "exact_dup" and r.exact_of == doc_id
        # near_of is the MIN candidate — the doc itself or an even
        # lower-id near-dup of it (10/11 are a near-dup family)
        assert r.n_cand >= 1 and r.near_of <= doc_id
