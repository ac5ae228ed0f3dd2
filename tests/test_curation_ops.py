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
