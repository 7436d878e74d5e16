"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Generalizes the reference's URL-keyed dedupe maps (collector.py:99,
129-141 TTL map; recorder.py:15,58-70) into the content-dedup family a
training-data pipeline needs at 100 TB:

- exact: hash-groupBy on (normalized) content — one shuffle, AQE-skew
  safe;
- MinHash+LSH: shingle -> portable 32-bit hash -> H permutation mins in
  ONE groupBy (H agg expressions, single shuffle) -> band buckets ->
  bucket self-join for candidate pairs -> exact Jaccard verification;
- SimHash: 64-bit tf-weighted sign fingerprint, Hamming<=r matching via
  band equality + bit_count(xor) verification;
- n-gram Jaccard: exact pair similarity on word n-gram sets.

Everything is DataFrame ops (shuffles only where a groupBy/join is
semantically required); MinHash permutation hashes use md5-derived
32-bit values so the DuckDB oracle can reproduce signatures bit-exactly.

Degenerate-bucket contract (the one quadratic risk at web scale): a
real corpus has MASS exact duplicates — every copy of a viral document
lands in the same LSH band bucket, and a bucket self-join is quadratic
in the bucket (10^5 copies -> 10^10 candidate rows). Two defenses,
both on by default:

1. run ``exact_dedup`` FIRST — near-dup LSH is defined over exact-unique
   content, and this removes the degenerate mass outright;
2. every bucket self-join caps candidates per bucket
   (``bucket_cap``, window + row_number, smallest ids kept
   deterministically). The cap's actual guarantee: every capped-out row
   is still paired with the bucket's retained REPRESENTATIVE (its
   smallest id), so CONNECTIVITY to the bucket minimum is preserved —
   a templated near-dup family of any size stays connected to one
   survivor under ``transitive=True`` while the join stays linear per
   bucket. Pair-level recall within an oversized bucket IS reduced:
   pairs between two capped-out rows, or between a capped-out row and a
   retained non-representative row, are never generated, so in
   single-hop (non-transitive) dedup a capped-out row similar to a
   non-representative bucket member but NOT to the representative can
   escape. The cap's bite is observable as a named ``Observation``
   exposed on the result as ``df.bucket_overflow`` (read ``.get`` after
   any action) — raise ``bucket_cap`` when it fires and pair recall
   matters.
"""

from __future__ import annotations

import random
import time

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1

# default per-bucket candidate cap: a healthy LSH bucket holds tens of
# rows; 256 is generous headroom while bounding the self-join at
# ~32k pairs per degenerate bucket
DEFAULT_BUCKET_CAP = 256


def _cap_buckets(banded: DataFrame, keys: list[str], order_col: str,
                 bucket_cap: int, name: str, carry: tuple[str, ...] = ()):
    """Bound every (keys) bucket to its ``bucket_cap`` smallest
    ``order_col`` rows. Returns (capped_df, overflow_df, Observation).

    ``overflow_df`` holds the rows BEYOND the cap, each tagged with the
    bucket's retained representative (the smallest ``order_col`` row)
    as ``_rep_<order_col>`` plus ``_rep_<c>`` for every ``carry``
    column. Callers turn these into single-hop (representative, row)
    candidate pairs and union them into the output, so capping bounds
    the self-join (linear per bucket) while keeping every capped row
    connected to one survivor — connectivity preserved, pair-level
    recall inside the oversized bucket reduced (module docstring has
    the exact guarantee).

    The observation reports overflow rows and the largest bucket seen.
    All window functions share one partition spec: a single extra
    shuffle+sort on the same keys the self-join shuffles on anyway."""
    from pyspark.sql import Observation, Window

    w_rank = Window.partitionBy(*keys).orderBy(order_col)
    w_all = Window.partitionBy(*keys)
    obs = Observation(name)
    rep_cols = [
        F.first(c).over(w_rank).alias(f"_rep_{c}") for c in (order_col, *carry)
    ]
    tagged = (
        banded.select(
            "*",
            F.row_number().over(w_rank).alias("_rn"),
            F.count("*").over(w_all).alias("_bn"),
            *rep_cols,
        )
        .observe(
            obs,
            F.sum(
                F.when(
                    F.col("_rn") == 1,
                    F.greatest(F.col("_bn") - bucket_cap, F.lit(0)),
                ).otherwise(0)
            ).alias("dropped_rows"),
            F.max("_bn").alias("max_bucket"),
        )
    )
    rep_names = [f"_rep_{c}" for c in (order_col, *carry)]
    capped = tagged.filter(F.col("_rn") <= bucket_cap).drop("_rn", "_bn", *rep_names)
    overflow = tagged.filter(F.col("_rn") > bucket_cap).drop("_rn", "_bn")
    return capped, overflow, obs


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per distinct (normalized) content."""
    key = normalized_text(F.col(text_col))
    w_min = (
        df.groupBy(key.alias("_k"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(w_min, id_col, "left_semi")


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(keep_id, n_copies) for every content value occurring more than once."""
    key = normalized_text(F.col(text_col))
    return (
        df.groupBy(key.alias("_k"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("keep_id", "n_copies")
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of word k-shingles (distinct), lowercase, whitespace words."""
    words = F.split(normalized_text(text), " ")
    n = F.size(words)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k), lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))
            ),
        ).otherwise(F.array(F.concat_ws(" ", words)))
    )


def portable_hash32(col: Column) -> Column:
    """First 8 hex chars of md5 as a bigint in [0, 2^32) — bit-identical
    in Spark and DuckDB, which makes MinHash signatures oracle-checkable."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(n_hashes)]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) — H permutation minima in ONE shuffle."""
    params = minhash_params(n_hashes, seed)
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_k)).alias("_sh")
    ).withColumn("_h", portable_hash32(F.col("_sh")))
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(id_col, F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    n_hashes: int | None = None,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Band the signatures, bucket-join: pairs sharing >=1 identical band.

    The bucket self-join is the only quadratic risk at scale: healthy
    buckets are bounded by banding (r = H/bands rows per band), but a
    degenerate bucket (mass duplicates — run ``exact_dedup`` first, see
    module contract) is capped at ``bucket_cap`` rows for the
    self-join, with every capped-out row still paired against the
    bucket's smallest-id representative (connectivity preserved;
    pair-level recall inside the oversized bucket reduced — module
    docstring has the exact guarantee; overflow counts observable via
    ``df.bucket_overflow``). ``bucket_cap=None`` disables the cap
    (oracle-exact mode for small corpora)."""
    if n_hashes is None:
        first = sigs.select("sig").first()
        if first is None:  # empty corpus -> no pairs
            return sigs.sparkSession.createDataFrame([], "id1 long, id2 long")
        n_hashes = len(first["sig"])
    r = n_hashes // bands
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.concat_ws(",", *[F.col("sig")[b * r + j].cast("string") for j in range(r)]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bhash"),
    )
    obs = overflow = None
    if bucket_cap is not None:
        banded, overflow, obs = _cap_buckets(
            banded, ["band", "bhash"], id_col, bucket_cap, "lsh_bucket_overflow"
        )
    a = banded.alias("a")
    b = banded.alias("b")
    out = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bhash") == F.col("b.bhash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
    if overflow is not None:
        # single-hop representative pairs for capped-out rows: the rep
        # is the bucket minimum, so rep < row always holds
        out = out.unionByName(
            overflow.select(
                F.col(f"_rep_{id_col}").alias("id1"), F.col(id_col).alias("id2")
            )
        )
    out = out.distinct()
    out.bucket_overflow = obs
    return out


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact word-shingle Jaccard for given (id1, id2) pairs."""
    sh = df.select(F.col(id_col), word_shingles(F.col(text_col), shingle_k).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id1").withColumnRenamed("sh", "sh1"), "id1")
        .join(sh.withColumnRenamed(id_col, "id2").withColumnRenamed("sh", "sh2"), "id2")
        .withColumn("inter", F.size(F.array_intersect("sh1", "sh2")).cast("double"))
        .withColumn("uni", F.size(F.array_union("sh1", "sh2")).cast("double"))
        .select("id1", "id2", F.round(F.col("inter") / F.col("uni"), 4).alias("jaccard"))
    )
    return j


def connected_components(
    pairs: DataFrame, max_iters: int = 20
) -> DataFrame:
    """(id, rep) for every id in an (id1, id2) edge list, where rep is
    the smallest id reachable through the edges — min-label propagation
    with POINTER DOUBLING, run as iterated DataFrame joins. Each
    iteration does (a) a hop step (min over the EDGE list — never
    all-pairs) and (b) a shortcut step (rep := rep's rep), so the
    propagation distance DOUBLES per iteration and iterations scale
    with log2(component diameter): a 1000-deep adversarially chained
    near-dup family converges in ~10 iterations, not 1000. Every
    iteration is localCheckpoint-ed so the plan does not grow.

    Convergence is detected with a changed-label count. If the loop
    exits via ``max_iters`` with labels still moving, a RuntimeError is
    raised — truncation is never silent: incompletely propagated labels
    would split one duplicate cluster into several "reps" and
    ``minhash_dedup(transitive=True)`` would keep extra survivors."""
    edges = pairs.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    ).unionByName(
        pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )
    edges = edges.distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("rep", F.col("id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        # hop: each node's new label = min(own label, neighbours' labels)
        neigh = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("rep").alias("nrep"))
        )
        hop = (
            labels.withColumnRenamed("rep", "orep")
            .join(neigh, "id", "left")
            .select(
                "id",
                "orep",
                F.least("orep", F.coalesce("nrep", "orep")).alias("rep"),
            )
        )
        # shortcut (pointer doubling): rep := min(rep, rep's own rep).
        # rep is always a node id (labels start as own ids and only node
        # ids propagate), so the self-join key always resolves. ``hop``
        # is deliberately NOT materialized: both sides of the self-join
        # reference the same plan, so Spark reuses its exchange
        # (ReusedExchange) within the one job, and the single
        # localCheckpoint of ``new`` below still severs lineage per
        # iteration — one eager materialization per iteration instead of
        # the former two, which halved the per-iteration job count on
        # small graphs where driver round-trips dominate.
        # the changed-label count rides the checkpoint materialization
        # as an Observation (one job per iteration, not two: the
        # count previously re-ran as its own action over the
        # checkpointed rows, a pure driver round-trip per iteration)
        from pyspark.sql import Observation

        obs = Observation(f"cc_changed_{time.time_ns()}")
        new = (
            hop.join(
                hop.select(F.col("id").alias("rep"), F.col("rep").alias("rrep")),
                "rep",
                "left",
            )
            .select(
                "id",
                F.least(F.col("rep"), F.coalesce("rrep", "rep")).alias("rep"),
                (F.least(F.col("rep"), F.coalesce("rrep", "rep")) != F.col("orep"))
                .cast("int")
                .alias("chg"),
            )
            .observe(obs, F.sum("chg").alias("changed"))
            .drop("chg")
            .localCheckpoint(eager=True)
        )
        changed = obs.get["changed"] or 0
        labels = new
        if not changed:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in max_iters={max_iters} "
            f"iterations (labels still changing); with pointer doubling this "
            f"covers component diameters up to ~2^{max_iters} — raise max_iters"
        )
    return labels


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
    transitive: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Returns (deduped df, verified duplicate pairs).

    Default (``transitive=False``): a row is dropped when a
    verified-similar row with a smaller id exists (single-hop, like the
    reference's first-seen-wins map — A~B and B~C keeps A and C even
    when A!~C). ``transitive=True`` runs iterative connected components
    over the verified pairs instead, collapsing every duplicate cluster
    to its smallest id (A~B~C -> keep A only)."""
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, seed)
    cand = lsh_candidate_pairs(sigs, id_col, bands, n_hashes=n_hashes)
    verified = ngram_jaccard(df, cand, text_col, id_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )
    if transitive:
        comp = connected_components(verified.select("id1", "id2"))
        drop = comp.filter(F.col("id") != F.col("rep")).select(
            F.col("id").alias(id_col)
        )
    else:
        drop = verified.select(F.col("id2").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti"), verified


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash: sign of tf-weighted sum per bit of token hashes.

    Implemented as explode -> single groupBy with n_bits conditional-sum
    aggregates (one shuffle), then bit assembly JVM-side.
    ``portable=True`` uses the md5-derived 32-bit token hash (DuckDB-
    reproducible, pairs with n_bits=32); the default keeps xxhash64
    (cheaper, engine-internal)."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("_t"),
    )
    hcol = portable_hash32(F.col("_t")) if portable else F.xxhash64("_t")
    tok = tok.withColumn("_h", hcol)
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(n_bits)
    ]
    g = tok.groupBy(id_col).agg(*aggs)
    fp = None
    for i in range(n_bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseOR(term)
    return g.select(F.col(id_col), fp.alias("simhash"))


# -- map-side (shuffle-free) signature variants -------------------------
#
# minhash_signatures/simhash above shuffle the full shingle/token stream
# (explode -> groupBy) — that shape is what makes them bit-exactly
# DuckDB-checkable, but at 100 TB it moves ~every token through one
# exchange. Signatures are per-row pure functions, so the scale default
# is an Arrow-batched pandas UDF computing them with ZERO shuffle.
# Bit-parity with the oracle-checked variants is asserted in tests.

def _md5_hash32_np(strings: list[str]):
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in strings),
        dtype=np.int64,
        count=len(strings),
    )


def minhash_signatures_mapside(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Same signatures as ``minhash_signatures`` (bit-identical; same
    portable hash + permutations) but computed map-side: no explode, no
    shuffle — the H permutation minima come out of one pandas UDF."""
    from pyspark.sql import types as T

    params = minhash_params(n_hashes, seed)
    a = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    b = np.array([p[1] for p in params], dtype=np.int64)[:, None]

    def shingles(text: str) -> list[str]:
        import re

        words = re.sub(r"\s+", " ", (text or "").strip().lower()).split(" ")
        if len(words) >= shingle_k:
            sh = {
                " ".join(words[i : i + shingle_k])
                for i in range(len(words) - shingle_k + 1)
            }
        else:
            sh = {" ".join(words)}
        return sorted(sh)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(s: pd.Series) -> pd.Series:
        out = []
        for text in s:
            sh = shingles(text)
            if not sh:
                out.append([MERSENNE_P] * n_hashes)
                continue
            h = _md5_hash32_np(sh)[None, :]
            out.append(((a * h + b) % MERSENNE_P).min(axis=1).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), sig_udf(F.col(text_col)).alias("sig"))


def simhash_mapside(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 32,
) -> DataFrame:
    """Map-side SimHash, bit-identical to ``simhash(portable=True,
    n_bits=32)`` — tf-weighted sign bits from the md5-derived 32-bit
    token hash, zero shuffle."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def fp_udf(s: pd.Series) -> pd.Series:
        import re

        out = np.zeros(len(s), dtype=np.int64)
        for j, text in enumerate(s):
            toks = re.sub(r"\s+", " ", (text or "").strip().lower()).split(" ")
            if not toks:
                continue
            h = _md5_hash32_np(toks)
            bits = ((h[:, None] >> np.arange(n_bits)[None, :]) & 1) * 2 - 1
            sums = bits.sum(axis=0)
            out[j] = int(((sums > 0).astype(np.int64) << np.arange(n_bits)).sum())
        return pd.Series(out)

    return df.select(F.col(id_col), fp_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Candidate generation by 16-bit band equality (any doc pair within
    Hamming distance 3 of 64 bits shares at least one of 4 bands), then
    exact bit_count verification. Degenerate band buckets (mass
    duplicates — exact-dedup first, see module contract) are capped at
    ``bucket_cap`` rows for the self-join; capped-out rows still pair
    with the bucket's smallest-id representative (connectivity
    preserved, pair-level recall inside the oversized bucket reduced —
    see module docstring; overflow observable via
    ``df.bucket_overflow``)."""
    bands = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band", "bval"),
    )
    obs = overflow = None
    if bucket_cap is not None:
        bands, overflow, obs = _cap_buckets(
            bands, ["band", "bval"], id_col, bucket_cap,
            "simhash_bucket_overflow", carry=("simhash",),
        )
    a, b = bands.alias("a"), bands.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bval") == F.col("b.bval"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id1"),
        F.col(f"b.{id_col}").alias("id2"),
        F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
    )
    if overflow is not None:
        # capped-out rows verify against the bucket representative
        cand = cand.unionByName(
            overflow.select(
                F.col(f"_rep_{id_col}").alias("id1"),
                F.col(id_col).alias("id2"),
                F.bit_count(
                    F.col("_rep_simhash").bitwiseXOR(F.col("simhash"))
                ).alias("hamming"),
            )
        )
    out = cand.distinct().filter(F.col("hamming") <= max_hamming)
    out.bucket_overflow = obs
    return out
