"""JSON status normalization (reference T6): from_json + casts.

The reference's collector parses each streaming-API JSON payload and
projects it to a ``minimalStatus`` (collector.py:301-362 dispatch;
field extraction :85-127):

- url: scheme stripped, ``domain + path`` (collector.py:85-87)
- text: HTML body -> plain text (collector.py:102)
- subject: ``spoiler_text`` verbatim (:122)
- created: epoch seconds from ISO timestamp (:111-123)
- language (:125), bot = account.bot (:125),
  reply = in_reply_to_id is not null (:126),
  attachments = len(media_attachments) != 0 (:127)

Spark-first: one ``from_json`` with an explicit schema (Catalyst JSON
parsing, no Python), then column casts; the only Python is the
Arrow-batched HTML UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aspublic_spark.functions.html import html_text_udf

STATUS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("spoiler_text", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("in_reply_to_id", T.StringType()),
        T.StructField(
            "account",
            T.StructType([T.StructField("bot", T.BooleanType())]),
        ),
        T.StructField(
            "media_attachments",
            T.ArrayType(T.StructType([T.StructField("type", T.StringType())])),
        ),
    ]
)


def normalize_status_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """JSON payload column -> minimalStatus-shaped rows.

    Output columns mirror ap_types.py:7-19: url (PK, scheme stripped),
    text, subject, created (epoch seconds), language, bot, reply,
    attachments. Rows whose JSON fails to parse or lack a url are
    dropped, like the collector's try/except-per-status."""
    s = F.from_json(F.col(json_col).cast("string"), STATUS_JSON_SCHEMA).alias("s")
    out = (
        df.select(s)
        .filter(F.col("s").isNotNull() & F.col("s.url").isNotNull())
        .select(
            F.regexp_replace("s.url", r"^[a-z][a-z0-9+.-]*://", "").alias("url"),
            html_text_udf(F.col("s.content")).alias("text"),
            F.coalesce("s.spoiler_text", F.lit("")).alias("subject"),
            F.unix_timestamp(F.to_timestamp("s.created_at")).alias("created"),
            F.coalesce("s.language", F.lit("")).alias("language"),
            F.coalesce("s.account.bot", F.lit(False)).alias("bot"),
            F.col("s.in_reply_to_id").isNotNull().alias("reply"),
            (F.coalesce(F.size("s.media_attachments"), F.lit(0)) > 0).alias(
                "attachments"
            ),
        )
    )
    return out


def unwrap_reblogs(df: DataFrame, json_col: str = "value", max_depth: int = 3) -> DataFrame:
    """I2: reblog unwrap (collector.py:78-80).

    Mastodon boosts reach the public stream as a wrapper status whose
    ``reblog`` field embeds the original; the reference re-imports the
    embedded payload in place of the wrapper (recursively). Spark-first:
    replace the payload with ``$.reblog`` wherever it is a JSON object,
    iterated ``max_depth`` times for nested wrappers — pure Catalyst
    (``get_json_object``), no UDF, and a JSON-null reblog field leaves
    the row untouched. Run BEFORE :func:`normalize_status_json`; the
    reference's "already-seen original is dropped" half is the ingest
    dedup downstream (I9 / ``anti_join_existing``), exactly as in the
    collector."""
    c = F.col(json_col).cast("string")
    for _ in range(max_depth):
        rb = F.get_json_object(c, "$.reblog")
        # object check, not just non-null: some non-Mastodon servers
        # emit reblog:false/"" — get_json_object returns those as
        # non-null scalars, which must NOT replace a valid status
        c = F.when(rb.isNotNull() & rb.startswith("{"), rb).otherwise(c)
    return df.withColumn(json_col, c)
