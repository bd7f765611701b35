"""Approximate-nearest-neighbor search over an embedding column.

The vector-space analog of the reference's KDTree radius probe
(reference matching_process/spatial_index.py:21-42: build once, batch
query, convert metric) — recast for Spark: no driver-side index; the
"index" is a bucketing column and the probe is a join.

Two paths:
- ``cosine_topk``      — exact brute force: queries x corpus join. The
  correctness baseline; at scale only viable for small query sets
  (broadcast the queries, never the corpus).
- ``lsh_cosine_topk``  — random-hyperplane LSH: sign-bit sketch ->
  band-key equi-join -> exact cosine re-rank within candidates. The
  scale path: corpus is bucketed once (write-time at 100 TB), probes
  touch matching buckets only.

Every cosine projection runs through the Arrow ``cosine_arrow_udf``
(measured 3.9x over the interpreted lambda at 80k dim-64 pairs, and
the gap grows with volume); the expression ``cosine`` is
CodegenFallback and survives as the SQL-shaped reference of the
contract, exercised by the equivalence tests.

Degenerate rows: NULL/empty embeddings are filtered at every operator
entry (``_usable_vectors``) and zero-norm vectors score NULL cosine —
see the `cosine` docstring for why NaN would otherwise rank first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL (not NaN) when either vector has zero norm: 0/0 would give
    NaN, which Spark's total order ranks ABOVE every double — a single
    zero vector (failed encode, padded row) would land at rank 1 of
    every top-k and pass every `>= threshold` pair filter. NULL instead
    sorts last under desc and fails the threshold comparison."""
    den = l2norm(a) * l2norm(b)
    return F.when(den != 0, dot(a, b) / den)


def _usable_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Drop rows whose embedding is NULL or empty — they carry no
    geometry, and one such row would otherwise abort a whole Arrow
    batch mid-job (np.asarray(None) is 0-d; stacking it raises
    ValueError), the 'one bad row kills a scan' failure mode. The
    declarative analog of neardup's phash.isNotNull() guard; F.size is
    codegen'd, so the filter rides the scan."""
    c = F.col(vec_col)
    return df.where(c.isNotNull() & (F.size(c) > 0))


def cosine_arrow_udf():
    """Arrow-batched exact cosine — the re-rank workhorse shared by the
    pair generator and both ANN top-k paths (the expression `cosine`
    is an aggregate/zip_with lambda: CodegenFallback, interpreted,
    measured ~10x slower — see signbit_sketch's note). Zero-norm rows
    yield pd.NA -> SQL NULL, matching the expression variant's
    contract."""

    @F.pandas_udf(T.DoubleType())
    def _cos(av: pd.Series, bv: pd.Series) -> pd.Series:
        if len(av) == 0:
            return pd.Series([], dtype="float64")
        A = np.asarray([np.asarray(x, np.float64) for x in av.tolist()])
        B = np.asarray([np.asarray(x, np.float64) for x in bv.tolist()])
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        out = pd.Series(
            np.divide(num, den, out=np.zeros_like(num), where=den != 0),
            dtype="Float64",
        )
        return out.mask(den == 0, pd.NA)

    return _cos


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (excludes self-match).

    Broadcasts the query side — the corpus (the 100 TB side) streams.
    NULL/empty embeddings are excluded up front (`_usable_vectors`);
    zero-norm vectors score NULL cosine and so never rank.
    """
    q = _usable_vectors(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = _usable_vectors(corpus, vec_col).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    _cos = cosine_arrow_udf()
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                _cos(
                    F.col("q_vec").cast("array<double>"),
                    F.col("c_vec").cast("array<double>"),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    win = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        # zero-norm candidates score NULL — rank real similarities only
        scored.where(F.col("cos_sim").isNotNull())
        .withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cos_sim", "rank")
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, cos >= t).

    Brute-force all-pairs — the exactness baseline for embedding-based
    dedup (LSH-bucketed variant: ``lsh_cosine_topk`` machinery). At
    corpus scale, restrict one side or bucket first; kept exact here
    because it is the oracle-checkable contract. NULL/empty embeddings
    are excluded; zero-norm vectors score NULL and fail the threshold.
    """
    src = _usable_vectors(corpus, vec_col)
    e = src.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).cast("array<double>").alias("av")
    )
    f = src.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).cast("array<double>").alias("bv")
    )
    _cos = cosine_arrow_udf()
    out = (
        e.crossJoin(f)
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(_cos(F.col("av"), F.col("bv")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    return out


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def signbit_sketch(vec: Column, planes: np.ndarray) -> Column:
    """int64 sign-bit sketch: bit_p = 1 iff dot(vec, plane_p) > 0.

    Catalyst-expression variant — kept as the SQL-shaped reference of
    the contract, but each plane's dot is an aggregate/zip_with lambda
    (CodegenFallback: interpreted, re-expanded per use), measured ~10x
    slower than the Arrow variant at 32 planes. Hot paths use
    ``signbit_sketch_udf``.
    """
    out = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        d = dot(vec, arr)
        out = out.bitwiseOR(
            F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return out


def signbit_sketch_udf(planes: np.ndarray):
    """Arrow-batched sketch: one (batch x dim) @ (dim x planes) matmul
    per batch instead of n_planes interpreted lambda-dots per row.

    Sign parity with the SQL oracle's list_dot_product: both compute
    the dot in float64; order-of-summation ulp differences flip a sign
    only when |dot| ~ 1e-12, vanishing for real embeddings.
    """
    P = planes.astype(np.float64)
    bits = (np.uint64(1) << np.arange(P.shape[0], dtype=np.uint64)).astype(np.uint64)

    @F.pandas_udf(T.LongType())
    def _sk(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        X = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vecs.tolist()], dtype=np.float64
        )
        S = (X @ P.T) > 0
        out = (S.astype(np.uint64) * bits).sum(axis=1).astype(np.int64)
        return pd.Series(out)

    return _sk


def _band_structs(band_bits: int, n_bands: int) -> Column:
    """The (band, key) struct array over a `sketch` column — THE one
    banding contract (mirrored by the oracle's band-key SQL), shared by
    the ANN probe and the pair generator."""
    mask = (1 << band_bits) - 1
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("sketch"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )


def _banded(
    df: DataFrame,
    prefix: str,
    planes: np.ndarray,
    band_bits: int,
    n_bands: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, exploded band struct) — SLIM: no vector column (every
    caller re-attaches vectors by id after the candidate dedup, the
    q44 lesson), so the n_bands-amplified explode never carries the
    embedding width. NULL/empty embeddings are dropped up front."""
    df = _usable_vectors(df, vec_col).select(
        F.col(id_col).alias(f"{prefix}_id"),
        signbit_sketch_udf(planes)(
            F.col(vec_col).cast("array<double>")
        ).alias("sketch"),
    )
    return df.select(
        f"{prefix}_id", F.explode(_band_structs(band_bits, n_bands)).alias("bk")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int = 16,
    n_planes: int = 32,
    n_bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Banded embedding near-dup pairs — the SCALE path for which
    ``cosine_pairs`` is the brute-force exactness baseline.

    Hyperplane sign-bit sketch -> per-band self equi-join -> exact
    cosine >= threshold on candidates only. No cross join: join volume
    is sum over band keys of k^2 within a bucket, and key width
    (n_planes / n_bands bits) is the skew dial — widen it as the corpus
    grows so buckets stay bounded. Recall < 1 by construction (a pair
    colliding in no band is missed); measured against cosine_pairs in
    tests. Deterministic: the oracle re-derives the identical plane
    literals (same seed) and band keys.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    band_bits = n_planes // n_bands
    base = _usable_vectors(corpus, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    # band join carries ONLY (id, band-key) — `_banded`, the one shared
    # banding contract: the wide vectors would multiply the candidate
    # shuffle by the embedding width; they join back by id after the
    # pair set is distinct. The banded frame feeds BOTH sides of the
    # self-join and Catalyst specializes shared subtrees, so without
    # the lazy localCheckpoint the Arrow sketch pass would run twice
    # (the repo's in-operator diamond rule).
    bands = _banded(
        base, "x", planes, band_bits, n_bands, "id", "vec"
    ).localCheckpoint(eager=False)
    # distinct column names on the two sides: self-join disambiguation
    # via same-name Column refs triggers Spark's trivially-true-predicate
    # WARN and leans on positional resolution — keep it out of the
    # correctness path
    a = bands.select(F.col("x_id").alias("a_id"), F.col("bk").alias("bk_a"))
    b = bands.select(F.col("x_id").alias("b_id"), F.col("bk").alias("bk_b"))
    pairs = (
        a.join(b, (F.col("bk_a") == F.col("bk_b")) & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id")
        .distinct()
    )
    va = base.select(F.col("id").alias("a_id"), F.col("vec").alias("a_vec"))
    vb = base.select(F.col("id").alias("b_id"), F.col("vec").alias("b_vec"))
    _cos = cosine_arrow_udf()
    return (
        pairs.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                _cos(
                    F.col("a_vec").cast("array<double>"),
                    F.col("b_vec").cast("array<double>"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def quantize_embeddings(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization stats (the ANN-memory
    compression step of an embedding pipeline): scale = max|v| / 127,
    q_i = round_half_away(v_i / scale), reported with the L2
    reconstruction error. One vectorized Arrow pass per batch; rounding
    is half-away-from-zero to match SQL round() exactly (numpy's
    default banker's rounding would diverge on exact .5 quotients).
    NULL/empty embeddings are excluded; vectors within a batch share
    one dimensionality (the embedding-table contract, as in
    ``signbit_sketch_udf``).
    """

    @F.pandas_udf("struct<scale:double, recon_err:double>")
    def _q(vecs: pd.Series) -> pd.DataFrame:
        # ONE vectorized pass over the whole Arrow batch (the
        # signbit_sketch_udf pattern) — a per-row Python loop here paid
        # batch-size rounds of interpreter dispatch for element-wise
        # arithmetic. All ops are element-wise or per-row reductions,
        # so results are bit-identical to the row-loop formulation.
        if len(vecs) == 0:
            return pd.DataFrame({"scale": [], "recon_err": []})
        X = np.asarray(
            [np.asarray(v, np.float64) for v in vecs.tolist()], dtype=np.float64
        )
        m = np.abs(X).max(axis=1)
        s = m / 127.0
        safe = np.where(s == 0, 1.0, s)
        R = X / safe[:, None]
        Q = np.sign(R) * np.floor(np.abs(R) + 0.5)
        err = np.sqrt(((X - Q * safe[:, None]) ** 2).sum(axis=1))
        zero = m == 0
        return pd.DataFrame(
            {"scale": np.where(zero, 0.0, s), "recon_err": np.where(zero, 0.0, err)}
        )

    return _usable_vectors(corpus, vec_col).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).select(
        id_col,
        _q(F.col("_v")).alias("_s"),
    ).select(
        id_col,
        F.round(F.col("_s.scale"), 6).alias("scale"),
        F.round(F.col("_s.recon_err"), 6).alias("recon_err"),
    )


def _nearest_centroids_udf(centroids: np.ndarray, n: int):
    """array<int> of the n nearest centroid ids (euclidean; ties break
    on the lower centroid id — the same total order the SQL oracle's
    ORDER BY dist, cid uses)."""
    C = centroids.astype(np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _nc(vecs: pd.Series) -> pd.Series:
        # one broadcasted (batch x k x dim) pass per Arrow batch; the
        # subtract-square-sum per element is IDENTICAL arithmetic to
        # the per-row loop (no a^2+b^2-2ab re-association, which could
        # flip near-tie assignments vs the SQL oracle), sqrt kept for
        # the same reason (it can merge ties the squared form
        # distinguishes), and argsort(kind='stable') is exactly the
        # lexsort-(cid, dist) tie-break.
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        X = np.asarray(
            [np.asarray(v, np.float64) for v in vecs.tolist()], dtype=np.float64
        )
        D = np.sqrt(((C[None, :, :] - X[:, None, :]) ** 2).sum(axis=2))
        order = np.argsort(D, axis=1, kind="stable")[:, :n]
        return pd.Series([[int(c) for c in row] for row in order])

    return _nc


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: deterministic mini-Lloyd coarse quantizer -> inverted
    bucket join -> exact cosine re-rank.

    The third ANN path beside brute force (``cosine_topk``) and LSH
    (``lsh_cosine_topk``): train ``n_centroids`` with ``n_iters`` Lloyd
    steps (init = the n_centroids lowest-id vectors; an emptied cluster
    keeps its previous centroid), index the corpus by nearest centroid
    (one int per row), probe the ``n_probe`` nearest centroid buckets
    per query. Fully deterministic — distance ties break on centroid
    id — so the DuckDB oracle unrolls the identical training in SQL.
    Training collects only k x dim aggregated means per iteration (the
    same bounded-aggregate contract as the langid/perplexity trainers,
    never raw vectors); at corpus scale the index is write-time
    bucketing and a probe touches ~n_probe/n_centroids of the data.
    """
    # base feeds n_iters+2 eager consumers (init collect, one means
    # collect per Lloyd step, the final indexing) plus the returned
    # frame — without a checkpoint every one re-runs the corpus scan,
    # the array cast and the assignment UDF (diamond-plan rule). Lazy
    # localCheckpoint: the init collect materializes it once, every
    # later pass reads the same RDD, blocks freed by the
    # ContextCleaner when the result is dropped.
    base = (
        _usable_vectors(corpus, vec_col)
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .localCheckpoint(eager=False)
    )
    C = np.array(
        [r["v"] for r in base.orderBy("id").limit(n_centroids).collect()],
        dtype=np.float64,
    )
    for _ in range(n_iters):
        assign = _nearest_centroids_udf(C, 1)
        assigned = base.withColumn("cid", assign(F.col("v"))[0])
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        C = C.copy()
        for r in means:
            C[r["cid"], r["pos"]] = r["m"]
    assign = _nearest_centroids_udf(C, 1)
    indexed = base.select(
        F.col("id").alias("c_id"),
        F.col("v").alias("c_vec"),
        assign(F.col("v"))[0].alias("cid"),
    )
    probes = _nearest_centroids_udf(C, n_probe)
    qp = _usable_vectors(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("cid", F.explode(probes(F.col("q_vec"))))
    cands = indexed.join(F.broadcast(qp), "cid").where(
        F.col("q_id") != F.col("c_id")
    )
    _cos = cosine_arrow_udf()
    scored = cands.select(
        "q_id",
        "c_id",
        F.round(_cos(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    win = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        # zero-norm candidates score NULL — rank real similarities only
        scored.where(F.col("cos_sim").isNotNull())
        .withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cos_sim", "rank")
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 16,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """ANN: hyperplane sketch -> banded candidate join -> exact re-rank.

    Recall < 1 by construction; tests measure recall vs ``cosine_topk``.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    band_bits = n_planes // n_bands
    cb = _banded(corpus, "c", planes, band_bits, n_bands, id_col, vec_col)
    qb = _banded(queries, "q", planes, band_bits, n_bands, id_col, vec_col)
    # slim candidate generation: the band join and the pair dedup carry
    # ONLY ids — the corpus vectors (n_bands-amplified by the explode)
    # would otherwise ride both shuffles. Vectors re-attach by id after
    # distinct (the q44 lesson: 13.6s -> 2.9s at sf0.1).
    cands = (
        cb.join(F.broadcast(qb), cb["bk"] == qb["bk"])
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .dropDuplicates(["q_id", "c_id"])
    )
    cvec = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    qvec = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    _cos = cosine_arrow_udf()
    scored = (
        cands.join(cvec, "c_id")
        .join(F.broadcast(qvec), "q_id")
        .select(
            "q_id",
            "c_id",
            F.round(
                _cos(
                    F.col("q_vec").cast("array<double>"),
                    F.col("c_vec").cast("array<double>"),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    win = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        # zero-norm candidates score NULL — rank real similarities only
        scored.where(F.col("cos_sim").isNotNull())
        .withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cos_sim", "rank")
    )
