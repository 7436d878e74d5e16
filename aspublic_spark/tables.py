"""Table layer: transcript schema, deterministic synthesis, IO.

The engine's primary input (BASELINE.json input_hint) is a table of
multi-turn conversation/agent transcripts::

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

This maps the reference's ``statuses`` row store (common/db_sqlite.py:25:
url PK, text, subject, created, language, bot, reply, attachments) onto
the transcript domain: doc key = (conv_id, turn_idx) <-> url; role/tool
<-> the tri-state bot/reply/attachments filters; ts <-> created.

``synth_transcripts`` generates the corpus DISTRIBUTED and STATELESSLY:
every column of every row is a pure function of the row id via
xxhash64 mixing, so the same (n_turns, seed) produces identical data at
any parallelism/partitioning — this is what lets the two-parallelism
scaling benchmark (local[8] vs local[32]) run on byte-identical input
without materializing it, and would synthesize 10^12 turns on a real
cluster without a driver bottleneck.

Iceberg is the intended production table format (partitioned by
days(ts) for retention pruning, the analog of the reference's hourly
``DELETE FROM statuses WHERE created < cutoff``, db_sqlite.py:46-52);
the sandbox has no Iceberg runtime on the classpath, so `write_table` /
`read_table` fall back to plain Parquet behind one seam.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

# ~120-word vocabulary, Zipf-ish by repetition: a word appearing k times in
# the expanded pool is k/len(pool) likely per slot. 'the' is the deliberate
# heavy-hitter for skew/salting tests (FIXTURES.md §5).
_VOCAB_CORE = (
    ["the"] * 40
    + ["and"] * 20
    + ["data"] * 12
    + ["query", "spark", "index"] * 8
    + ["search", "token", "merge", "table", "agent", "model"] * 5
    + ["shuffle", "join", "filter", "sort", "scan", "batch", "stream", "score"] * 3
    + [
        "partition", "postings", "varint", "phrase", "boolean", "ranked",
        "vector", "window", "schema", "column", "worker", "driver",
        "cluster", "payload", "status", "sample", "example", "keyword",
        "media", "reply", "planner", "codec", "block", "weight", "bucket",
        "salt", "skew", "czech", "delta", "gamma", "sigma", "omega",
        "alpha", "beta", "kappa", "lambda", "theta", "zeta", "eta",
        "apple", "banana", "cherry", "date", "elder", "fig", "grape",
        "house", "igloo", "jungle", "kite", "lemon", "mango", "night",
        "ocean", "piano", "quartz", "river", "stone", "tiger", "umbra",
        "valley", "whale", "xenon", "yacht", "zebra",
    ]
)

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "bash", "browser", "calc"]


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    turns_per_conv: int = 8,
    min_words: int = 4,
    max_words: int = 40,
) -> DataFrame:
    """Deterministic transcripts DataFrame, distributed generation.

    Stateless per row: identical output for any partitioning. Roughly
    Zipfian word frequencies with 'the' as heavy hitter.
    """
    pool = _VOCAB_CORE
    pool_sz = len(pool)
    vocab_lit = F.array(*[F.lit(w) for w in pool])
    df = spark.range(n_turns)
    h = lambda *cols: F.xxhash64(F.lit(seed), *cols)  # noqa: E731
    nw_span = max_words - min_words + 1
    df = (
        df.withColumn("conv_n", (F.col("id") / turns_per_conv).cast("long"))
        .withColumn("conv_id", F.format_string("c%09d", F.col("conv_n")))
        .withColumn("turn_idx", F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int"))
        .withColumn(
            "role",
            F.element_at(
                F.array(*[F.lit(r) for r in ROLES]),
                (F.pmod(h(F.col("id"), F.lit(1)), F.lit(4)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "tool",
            F.when(
                F.pmod(h(F.col("id"), F.lit(2)), F.lit(5)) == 0,
                F.element_at(
                    F.array(*[F.lit(t) for t in TOOLS]),
                    (F.pmod(h(F.col("id"), F.lit(3)), F.lit(len(TOOLS))) + 1).cast("int"),
                ),
            ).otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "n_words",
            (F.pmod(h(F.col("id"), F.lit(4)), F.lit(nw_span)) + min_words).cast("int"),
        )
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_words") - 1),
                    lambda i: F.element_at(
                        vocab_lit,
                        (F.pmod(F.xxhash64(F.lit(seed), F.col("id"), F.lit(100) + i), F.lit(pool_sz)) + 1).cast("int"),
                    ),
                ),
                " ",
            ),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1700000000)
                + F.col("conv_n") * 3600
                + F.col("turn_idx") * 37
            ),
        )
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    return df


def fixture_transcripts(spark: SparkSession) -> DataFrame:
    """The 6-row golden fixture (FIXTURES.md §2; port of the reference's
    inline corpus, tests/test_sqlite.py:10-15, onto the transcript schema)."""
    rows = [
        ("c1", 0, "user", "This is a sample status.", None, 1700000000),
        ("c1", 1, "assistant", "This is a sample reply.", None, 1700000001),
        ("c1", 2, "user", "This is a sample media status.", "attach", 1700000002),
        ("c1", 3, "assistant", "This is a sample bot status.", "bot", 1700000003),
        ("c1", 4, "user", "This is an example status.", None, 1700000004),
        ("c1", 5, "user", "This is an example status with a keyword.", None, 1700000005),
    ]
    df = spark.createDataFrame(
        [(c, i, r, t, tool, ts) for c, i, r, t, tool, ts in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts_epoch long",
    )
    return df.withColumn("ts", F.timestamp_seconds("ts_epoch")).drop("ts_epoch")


def realign_fields(
    df: DataFrame,
    schema: T.StructType = TRANSCRIPTS_SCHEMA,
    strict: bool = False,
) -> DataFrame:
    """I10: field-map re-alignment (recorder.py:54-70).

    The reference zips a remote sender's ``statusmap`` (its field ORDER)
    by NAME into local kwargs whenever the orders disagree. The Spark
    analog aligns any incoming DataFrame to a target schema by name
    (case-insensitive, like Spark's own resolver): columns are
    reordered, cast to the target types, and missing NULLABLE fields
    fill with null. A missing non-nullable field always raises;
    ``strict=True`` additionally rejects extra columns instead of
    dropping them. Pure projection — Catalyst elides the no-op casts,
    so canonical input passes through plan-unchanged."""
    by_lower = {}
    for c in df.columns:
        by_lower.setdefault(c.lower(), c)
    cols = []
    for f in schema.fields:
        src = by_lower.get(f.name.lower())
        if src is not None:
            cols.append(F.col(src).cast(f.dataType).alias(f.name))
        elif f.nullable:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"realign_fields: required field '{f.name}' missing "
                f"from input columns {df.columns}"
            )
    if strict:
        extra = set(df.columns) - {
            by_lower[f.name.lower()]
            for f in schema.fields
            if f.name.lower() in by_lower
        }
        if extra:
            raise ValueError(f"realign_fields: unexpected columns {sorted(extra)}")
    return df.select(*cols)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided parquet table from an sf dir."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, if any (production path)."""
    try:
        for k, v in spark.sparkContext.getConf().getAll():
            # only the 4-segment key `spark.sql.catalog.<name>` names the
            # catalog; sub-keys like `...<name>.catalog-impl` (whose
            # values also contain 'iceberg') must not match
            parts = k.split(".")
            if (
                len(parts) == 4
                and k.startswith("spark.sql.catalog.")
                and "iceberg" in str(v).lower()
            ):
                return parts[3]
    except Exception:
        pass
    return None


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by=None,
    days_ts_col: str | None = None,
):
    """Write a table — Iceberg `writeTo(...).partitionedBy(days(ts))`
    when a catalog is configured, Parquet otherwise (the sandbox path).

    ``days_ts_col``: partition by day of that timestamp column — the
    Iceberg `days(ts)` transform. The Parquet fallback materializes a
    `day` column and uses directory partitioning, so time-range
    predicates prune PARTITIONS (not just row groups) either way —
    the retention-prune analog of db_sqlite.py:46-52 becomes a
    metadata-only partition drop."""
    spark = df.sparkSession
    cat = _iceberg_catalog(spark)
    if cat is not None and not path.startswith("/"):
        wt = df.writeTo(f"{cat}.{path}")
        if days_ts_col:
            wt = wt.partitionedBy(F.days(F.col(days_ts_col)))
        elif partition_by:
            wt = wt.partitionedBy(*[F.col(c) for c in partition_by])
        (wt.createOrReplace if mode == "overwrite" else wt.append)()
        return
    if days_ts_col:
        df = df.withColumn("day", F.to_date(F.col(days_ts_col)))
        partition_by = ["day"]
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def retention_prune(df: DataFrame, cutoff_ts) -> DataFrame:
    """Retention analog of the reference's hourly prune
    (db_sqlite.py:46-52, recorder.py:93-105): keep rows with ts >= cutoff.
    On Iceberg with days(ts) partitioning this is a metadata-only
    partition drop; as a DataFrame op it is a pushed-down filter."""
    return df.filter(F.col("ts") >= F.lit(cutoff_ts))
