"""IR ranking operators (operators/ranking.py): TF-IDF and BM25.

Expectations are hand-computed by a pure-Python mirror (math.log, not
the JVM), so the tests are an independent check of the math — the
cross-engine DuckDB twin is graded separately by the driver gate
(__spark_entry__: tfidf_top / bm25)."""

import math

import pytest

from radarpipeline_spark.operators.ranking import (
    bm25_search,
    term_frequencies,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "spark shuffles the quick partitions"),
        (2, "bm25 ranks spark spark spark documents"),
        (3, "a lazy dog sleeps"),
        (4, "quick quick brown fox"),
        (5, "the the the filler document"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_tf(rows):
    """(doc_id -> {term: tf}, doc_id -> dl) via the same whitespace
    tokenization + lowering."""
    tf, dl = {}, {}
    for i, text in rows:
        toks = [t.lower() for t in text.strip().split()]
        dl[i] = len(toks)
        d = tf.setdefault(i, {})
        for t in toks:
            d[t] = d.get(t, 0) + 1
    return tf, dl


ROWS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles the quick partitions"),
    (2, "bm25 ranks spark spark spark documents"),
    (3, "a lazy dog sleeps"),
    (4, "quick quick brown fox"),
    (5, "the the the filler document"),
]


def test_term_frequencies(spark, docs):
    out = {
        (r.doc_id, r.term): (r.tf, r.dl)
        for r in term_frequencies(docs).collect()
    }
    tf, dl = _py_tf(ROWS)
    exp = {
        (i, t): (c, dl[i]) for i, d in tf.items() for t, c in d.items()
    }
    assert out == exp


def test_tfidf_top_terms_matches_python_mirror(spark, docs):
    tf, _ = _py_tf(ROWS)
    n = len(ROWS)
    dfreq = {}
    for d in tf.values():
        for t in d:
            dfreq[t] = dfreq.get(t, 0) + 1
    exp = {}
    for i, d in tf.items():
        scored = sorted(
            (
                (round(c * math.log((n + 1.0) / (dfreq[t] + 1.0)), 6), t)
                for t, c in d.items()
            ),
            key=lambda s: (-s[0], s[1]),
        )[:2]
        exp[i] = [(t, s) for s, t in scored]
    out = tfidf_top_terms(docs, top_n=2).orderBy("doc_id", "rnk").collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.term, r.tfidf))
        assert r.df == dfreq[r.term] and r.tf == tf[r.doc_id][r.term]
    assert got == exp


def test_tfidf_max_df_ratio_drops_stopwords(spark, docs):
    # 'the' is in 3/6 docs; a 0.4 cap must exclude it everywhere while
    # rarer terms survive.
    out = tfidf_top_terms(docs, top_n=10, max_df_ratio=0.4).collect()
    terms = {r.term for r in out}
    assert "the" not in terms and "quick" not in terms  # df 3/6 each
    assert "spark" in terms  # df 2/6
    # uncapped keeps them
    full = {r.term for r in tfidf_top_terms(docs, top_n=10).collect()}
    assert "the" in full


def test_bm25_matches_python_mirror(spark, docs):
    tf, dl = _py_tf(ROWS)
    n = len(ROWS)
    avgdl = sum(dl.values()) / n
    q = ["spark", "lazy"]
    dfreq = {t: sum(1 for d in tf.values() if t in d) for t in q}
    k1, b = 1.2, 0.75
    exp = {}
    for i, d in tf.items():
        s = 0.0
        for t in q:
            if t not in d:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            c = idf * (d[t] * (k1 + 1.0)) / (
                d[t] + k1 * (1.0 - b + b * dl[i] / avgdl)
            )
            s += round(c, 6)
        if s:
            exp[i] = round(s, 6)
    out = bm25_search(docs, q, top_k=10).collect()
    got = {r.doc_id: r.bm25 for r in out}
    assert got == pytest.approx(exp, abs=1e-9)
    # doc 2 (three 'spark' hits, short) must outrank the single-hit docs
    assert out[0].doc_id == 2


def test_bm25_requires_terms_and_is_jvm_only(spark, docs):
    with pytest.raises(ValueError):
        bm25_search(docs, [])
    for q in (
        bm25_search(docs, ["spark"]),
        tfidf_top_terms(docs, max_df_ratio=0.5),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


def test_vocabulary_counts_and_topk_determinism(spark):
    from radarpipeline_spark.operators.ranking import vocabulary

    rows = [
        (0, "a b a"),      # a: tf 2; b: tf 1
        (1, "b c"),
        (2, "a c c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {r.term: (r.df, r.total_tf) for r in vocabulary(df).collect()}
    assert full == {"a": (2, 3), "b": (2, 2), "c": (2, 3)}
    # all terms tie on df=2 -> the term-ascending tiebreak makes the
    # top-2 cut deterministic
    top = vocabulary(df, top_k=2).collect()
    assert [r.term for r in top] == ["a", "b"]
    # top-k lowers to a per-partition heap, not a global sort
    plan = vocabulary(df, top_k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
