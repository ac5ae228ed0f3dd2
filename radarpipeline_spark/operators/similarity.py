"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force top-k: the correctness
  baseline.  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM
  higher-order functions, no Python).  Queries are broadcast — the
  corpus never shuffles; cost is one pass over the corpus per batch of
  queries, embarrassingly parallel at 100TB.
* :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH.
  Hyperplane components are pure functions of (seed, plane, dim) via
  the cross-engine h60 hash, so the index is deterministic and
  rebuildable anywhere.  Top-k within matching buckets only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from radarpipeline_spark.operators.dedup import h60


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query row: the k nearest corpus rows by cosine
    similarity (self excluded), deterministic tie-break on corpus id."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    # Broadcast the QUERY batch and stream the corpus: the corpus is
    # the 100TB side and must never be collected to one JVM; each
    # corpus partition scans against the (small) broadcast query set,
    # embarrassingly parallel.  Plan shape pinned by
    # tests/test_pipeline_ops.py::test_cosine_topk_broadcasts_queries.
    sims = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "corpus_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def plane_weights(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """±1 hyperplane weights, precomputed ONCE on the driver
    (n_planes × dim floats — tiny) and shipped as literals.

    Derivation is the same md5-based h60 the old per-row Catalyst
    expression used — w(p,d) = +1 iff h60(f"{seed}#{p}#{d}") is odd —
    so signatures are unchanged, reproducible in DuckDB SQL, and no
    longer cost n_planes × dim md5 calls per ROW."""
    import hashlib

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        [1.0 if h(f"{seed}#{p}#{d}") % 2 == 1 else -1.0 for d in range(dim)]
        for p in range(n_planes)
    ]


def hyperplane_signature(
    vec_col, dim: int, n_planes: int = 16, seed: int = 42
):
    """Deterministic random-hyperplane signature: bit p = sign of
    sum_d vec[d] * w(p, d), with w in {-1, +1} from :func:`plane_weights`.

    The per-plane component is a strict left fold (aggregate starting
    at 0.0) so the float result is bit-reproducible in any engine that
    folds left-to-right (DuckDB list_reduce in the oracle)."""
    weights = plane_weights(dim, n_planes, seed)

    def plane_bit(p: int):
        warr = F.array(*[F.lit(x) for x in weights[p]])
        comp = F.aggregate(
            F.zip_with(vec_col, warr, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(comp >= 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(0)

    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        sig = sig + plane_bit(p)
    return sig


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share the full hyperplane bucket;
    exact cosine + rank within candidates.  Recall/cost tradeoff via
    n_planes (more planes = smaller buckets = faster, lower recall).

    Pass ``dim`` explicitly in production: the fallback runs a one-row
    driver action to sniff it, which blocks plan construction."""
    dim = dim if dim is not None else len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
        hyperplane_signature(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        hyperplane_signature(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    sims = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-by-embedding
    variant): all (a < b) pairs with cosine >= threshold.

    n_planes=0 -> exact all-pairs (the correctness baseline; fine for
    broadcastable corpora).  n_planes>0 -> LSH-bucketed: only pairs
    sharing a hyperplane bucket are compared — the linear-ish scale
    path, at some recall cost near the threshold.
    """
    # norms hoisted to one-per-row: recomputing them per PAIR turns an
    # O(n*d) preprocessing into O(n^2*d) work (measured 43s -> ~14s at
    # 5000x64).  Same FP expression per pair, so results are bit-equal.
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    if n_planes:
        dim = dim if dim is not None else len(corpus.select(vec_col).first()[0])
        sig = hyperplane_signature
        a = a.withColumn("bucket", sig(F.col("va"), dim, n_planes, seed))
        b = b.withColumn("bucket", sig(F.col("vb"), dim, n_planes, seed))
        joined = a.join(b, on="bucket")
    else:
        joined = a.join(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def _avg_vec(col, order_col, dim: int):
    """Element-wise mean of an array column via aggregate over a
    zip-summed accumulator (JVM higher-order functions).

    Summation order is pinned by sorting the collected (order, vec)
    pairs: float addition is non-associative, so an unsorted
    collect_list would make centroid values depend on task scheduling —
    breaking run-to-run determinism AND the DuckDB oracle replay."""
    pairs = F.sort_array(
        F.collect_list(F.struct(order_col.alias("o"), col.alias("x")))
    )
    zero = F.array_repeat(F.lit(0.0), dim)
    summed = F.aggregate(
        pairs,
        zero,
        lambda acc, p: F.zip_with(acc, p.x, lambda a, b: a + b.cast("double")),
    )
    n = F.size(pairs)
    return F.transform(summed, lambda x: x / n)


def ivf_index(
    corpus: DataFrame,
    n_lists: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) index: deterministic seeded k-means.

    Init: the n_lists corpus rows with the smallest h60(seed, id) —
    a reproducible pseudo-random sample with no Date/random calls.
    Iterate: assign-to-nearest-centroid (broadcast centroids, one corpus
    pass) -> recompute means.  Returns (assignments, centroids); both
    deterministic given (corpus, seed).

    Iterative DataFrame algorithm: each iteration is one broadcast join
    + one groupBy — no driver-side loops over data, only over
    iterations.  Centroids are collected to the driver (n_lists x dim
    floats, tiny) to keep the assignment join a broadcast.
    """
    spark = corpus.sparkSession
    dim = dim if dim is not None else len(corpus.select(vec_col).first()[0])
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))

    init = (
        c.withColumn("__r", h60(F.concat_ws("#", F.lit(str(seed)), F.col("cid").cast("string"))))
        .orderBy("__r")
        .limit(n_lists)
        .select(F.col("v").alias("centroid"))
        .rdd.zipWithIndex()
        .map(lambda t: (t[1], [float(x) for x in t[0]["centroid"]]))
        .collect()
    )
    centroids = init  # list[(list_id, vector)]

    def assign(cent) -> DataFrame:
        cdf = spark.createDataFrame(cent, "list_id int, centroid array<double>")
        sims = c.join(F.broadcast(cdf)).select(
            "cid",
            "v",
            "list_id",
            (_dot(F.col("v"), F.col("centroid"))
             / (_norm(F.col("v")) * _norm(F.col("centroid")))).alias("sim"),
        )
        w = Window.partitionBy("cid").orderBy(F.col("sim").desc(), F.col("list_id"))
        return sims.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") == 1
        ).select("cid", "v", "list_id")

    for _ in range(iters):
        assigned = assign(centroids)
        centroids = [
            (r["list_id"], [float(x) for x in r["c"]])
            for r in assigned.groupBy("list_id")
            .agg(_avg_vec(F.col("v"), F.col("cid"), dim).alias("c"))
            .collect()
        ]
    assignments = assign(centroids).select("cid", "list_id")
    cdf = spark.createDataFrame(centroids, "list_id int, centroid array<double>")
    return assignments, cdf


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: each query probes its n_probe nearest
    centroid lists; exact cosine + rank within those lists only.  Scan
    fraction ~ n_probe / n_lists of the corpus per query."""
    assignments, cdf = ivf_index(corpus, n_lists, 3, id_col, vec_col, seed, dim)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    ).join(assignments.withColumnRenamed("cid", "corpus_id"), on="corpus_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    qsims = q.join(F.broadcast(cdf)).select(
        "query_id", "qv", "qn", "list_id",
        (_dot(F.col("qv"), F.col("centroid"))
         / (F.col("qn") * _norm(F.col("centroid")))).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("list_id"))
    probes = qsims.withColumn("rk", F.row_number().over(wq)).filter(
        F.col("rk") <= n_probe
    ).select("query_id", "qv", "qn", "list_id")
    sims = (
        probes.join(c, on="list_id")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", F.round("cosine", 6).alias("cosine"))
    )
