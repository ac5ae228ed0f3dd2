"""Repetition quality metrics (operators/text.py:repetition_stats) and
benchmark decontamination (operators/decontam.py) — hand-computed
expectations; the cross-engine twins are graded by the driver gate
(`repetition` / `decontaminate` queries)."""

import pytest

from radarpipeline_spark.operators.decontam import (
    benchmark_ngram_hashes,
    ngram_decontaminate,
)
from radarpipeline_spark.operators.text import repetition_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "a b" appears 3x of 5 2-grams; "a b a" twice of 4 3-grams
        (0, "a b a b a b"),
        (1, "w x y z q r"),                     # all grams unique
        (2, "spam spam spam spam"),             # total repetition
        (3, "one"),                             # short-doc fallback
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats(spark, docs):
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert len(out) == 4
    # doc 0: 2-grams [ab,ba,ab,ba,ab] -> top 'a b'=3/5; 3-grams
    # [aba,bab,aba,bab] -> all duplicated -> 4/4
    assert out[0].n_2grams == 5 and out[0].top_2gram_frac == pytest.approx(0.6)
    assert out[0].n_3grams == 4 and out[0].dup_3gram_frac == 1.0
    # doc 1: nothing repeats
    assert out[1].top_2gram_frac == pytest.approx(0.2)  # 1/5 each
    assert out[1].dup_3gram_frac == 0.0
    # doc 2: one distinct 2-gram, one distinct 3-gram
    assert out[2].top_2gram_frac == 1.0 and out[2].dup_3gram_frac == 1.0
    # doc 3: single token -> fallback gram, no duplication possible
    assert out[3].n_2grams == 1 and out[3].dup_3gram_frac == 0.0


def test_decontaminate_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (0, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),   # shares 8-grams w/ bench
            (1, "b1 b2 b3 b4 b5 b6 b7 b8 b9"),       # disjoint
            (2, "a2 a3 a4 a5 a6 a7 a8 a9 x y"),      # one shared 8-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a1 a2 a3 a4 a5 a6 a7 a8 a9")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in ngram_decontaminate(corpus, bench, n=8).collect()}
    assert len(out) == 3  # zero-overlap docs kept
    # doc 0 has 3 distinct 8-grams; grams 1..2 overlap bench's 2
    assert out[0].n_grams == 3 and out[0].n_overlap == 2
    assert out[0].contaminated is True
    assert out[1].n_overlap == 0 and out[1].contaminated is False
    assert out[2].n_overlap == 1 and out[2].contaminated is True
    assert out[2].overlap_frac == pytest.approx(round(1 / 3, 6))


def test_decontaminate_short_docs_use_fallback_gram(spark):
    # docs under n tokens hash the whole text as one gram — an exact
    # short-text match is still caught
    corpus = spark.createDataFrame(
        [(0, "tiny doc"), (1, "other text")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    out = {r.doc_id: r.contaminated for r in
           ngram_decontaminate(corpus, bench, n=8).collect()}
    assert out == {0: True, 1: False}


def test_decontaminate_plan_is_broadcast_and_jvm_only(spark, docs):
    q = ngram_decontaminate(docs, docs.limit(1), n=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    n_bench = benchmark_ngram_hashes(docs.limit(1), n=3).count()
    assert n_bench > 0


def test_decontaminate_shuffle_fallback_parity(spark):
    """VERDICT r5 #8: the documented shuffle-join fallback for
    benchmark sides past broadcast memory must exist and agree with
    the broadcast path bit-for-bit; its plan must actually drop the
    broadcast (SortMerge/ShuffledHash on the gram key)."""
    corpus = spark.createDataFrame(
        [
            (0, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
            (1, "b1 b2 b3 b4 b5 b6 b7 b8 b9"),
            (2, "a2 a3 a4 a5 a6 a7 a8 a9 x y"),
            (3, "tiny"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a1 a2 a3 a4 a5 a6 a7 a8 a9")], "doc_id long, text string"
    )
    bc = ngram_decontaminate(corpus, bench, n=8)
    # test data is tiny, so the optimizer would auto-broadcast the
    # unhinted side anyway — pin the thresholds off so the assert sees
    # the shape a too-big-to-broadcast benchmark side would get
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        sh = ngram_decontaminate(corpus, bench, n=8, broadcast_bench=False)
        rows_sh = sorted(map(tuple, sh.collect()))
        plan = sh._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert sorted(map(tuple, bc.collect())) == rows_sh
    assert "BroadcastHashJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_pii_stats_and_scrub(spark):
    from radarpipeline_spark.operators.pii import pii_scrub, pii_stats

    rows = [
        (0, "mail me at jane.doe+x@corp.example.org thanks"),
        (1, "fetch https://example.com/a?b=c#d then stop"),
        (2, "server at 192.168.1.100 port open"),
        (3, "call +1(555)123-4567 today"),
        (4, "nothing sensitive here"),
        # URL with an email-shaped authority: URL scrub runs first, so
        # the whole thing collapses to <URL>, never a half-<EMAIL>
        (5, "login ftp https://user@host.example.com/path ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    st = {r.doc_id: r for r in pii_stats(df).collect()}
    assert st[0].n_emails == 1 and st[0].has_pii is True
    assert st[1].n_urls == 1 and st[1].n_emails == 0
    assert st[2].n_ips == 1
    assert st[3].n_phones == 1
    assert st[4].has_pii is False
    # doc 5 counts both (independent per-category counts by contract)
    assert st[5].n_urls == 1 and st[5].n_emails == 1

    sc = {r.doc_id: r.text for r in pii_scrub(df).collect()}
    assert sc[0] == "mail me at <EMAIL> thanks"
    assert sc[1] == "fetch <URL> then stop"
    assert sc[2] == "server at <IP> port open"
    assert sc[3] == "call <PHONE> today"
    assert sc[4] == "nothing sensitive here"
    assert sc[5] == "login ftp <URL> ok"

    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_pii_adversarial_inputs_stay_linear(spark):
    """VERDICT r5 #5: pin regex runtime LINEARITY on both engines.
    With the pre-r6 unbounded email local-part, a backtracking matcher
    (Java; Python `re` reproduces it) took ~59s on ONE 200k-char
    unbroken token — O(run²) from per-start re-scans — while RE2
    stayed linear.  The RFC-bounded patterns make per-start work
    constant; these pathological single documents must now clear both
    engines in interactive time AND agree on counts."""
    import time

    import duckdb

    from radarpipeline_spark.operators.pii import PII_PATTERNS, pii_stats

    adversarial = [
        (0, "a" * 200_000),                      # unbroken token
        (1, "a@" * 100_000),                     # many-@ string
        (2, "x@" + "a." * 100_000 + "!"),        # domain dot-run bait
        (3, "9" * 200_000),                      # digit run (phone)
        (4, "9-" * 100_000),                     # digit-start retry bait
        (5, "1.2.3." * 30_000),                  # ip prefix bait
        (6, "+1" + "()" * 100_000 + "2"),        # paren run
    ]
    df = spark.createDataFrame(adversarial, "doc_id long, text string")
    t0 = time.perf_counter()
    got = {r.doc_id: r for r in pii_stats(df).collect()}
    spark_dt = time.perf_counter() - t0
    # quadratic blowup is minutes at this size; linear is well under a
    # second — 30s absorbs shared-host noise while still failing any
    # O(n²) reintroduction by an order of magnitude
    assert spark_dt < 30.0, f"Java regex path non-linear: {spark_dt:.1f}s"

    con = duckdb.connect()
    t0 = time.perf_counter()
    for doc_id, text in adversarial:
        for name, pat in PII_PATTERNS.items():
            n = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text, pat]
            ).fetchone()[0]
            assert n == got[doc_id][f"n_{name}s"], (doc_id, name)
    duck_dt = time.perf_counter() - t0
    assert duck_dt < 30.0, f"RE2 path non-linear: {duck_dt:.1f}s"
