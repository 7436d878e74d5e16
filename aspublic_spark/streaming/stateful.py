"""Custom stateful streaming operator: per-conversation rollup.

The reference keeps per-stream mutable counters in process memory (the
listenerStats dict, common/ap_types.py:22-32, and the TTL'd dedupe map,
collector.py:129-141). The Spark-native generalization is
``applyInPandasWithState``: keyed state owned by the engine — persisted
in the checkpoint, partitioned across executors, recovered on restart —
with the per-key update logic as an Arrow-batched pandas function.
Event times are converted to epoch microseconds JVM-side
(``unix_micros`` in the plan, exactly like the batch oracle) BEFORE the
stateful op, so the rollup is session-timezone-independent — pandas
never sees a rendered timestamp.

``conversation_rollup_stream`` maintains one state row per conv_id
(turn/role counters + first/last event time) and emits the UPDATED
rollup for every conversation that received rows in a micro-batch
(update semantics: downstream sinks see the latest value per key).
Timestamps live in state as epoch microseconds (plain longs) so state
round-trips carry no timezone/representation drift.

At scale this is one hash exchange by conv_id (the same partitioning
the engine already uses for doc ids); state size is O(distinct
conversations), never O(turns).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

ROLLUP_SCHEMA = (
    "conv_id string, n_turns long, n_user long, n_assistant long, "
    "first_ts_us long, last_ts_us long"
)
_STATE_SCHEMA = (
    "n_turns long, n_user long, n_assistant long, first_ts_us long, last_ts_us long"
)


def _rollup_fn(key, pdfs, state):
    conv_id = key[0]
    n = nu = na = 0
    first = last = None
    if state.exists:
        n, nu, na, first, last = state.get
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        nu += int((pdf["role"] == "user").sum())
        na += int((pdf["role"] == "assistant").sum())
        # ts_us is computed JVM-side by unix_micros() in the plan (see
        # conversation_rollup_stream): plain longs cross Arrow with no
        # session-timezone rendering, so the rollup matches the batch
        # oracle under ANY spark.sql.session.timeZone.
        ts_us = pdf["ts_us"]
        mn, mx = int(ts_us.min()), int(ts_us.max())
        first = mn if first is None else min(first, mn)
        last = mx if last is None else max(last, mx)
    state.update((n, nu, na, first, last))
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_turns": n,
                "n_user": nu,
                "n_assistant": na,
                "first_ts_us": first,
                "last_ts_us": last,
            }
        ]
    )


def conversation_rollup_stream(stream: DataFrame) -> DataFrame:
    """Streaming per-conversation rollup over the transcript schema
    (conv_id, role, ts, ...): engine-owned keyed state, updated per
    micro-batch, emitted in update mode."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select("conv_id", "role", F.unix_micros("ts").alias("ts_us"))
        .groupBy("conv_id")
        .applyInPandasWithState(
            _rollup_fn,
            ROLLUP_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def conversation_rollup_batch(df: DataFrame) -> DataFrame:
    """Batch-equivalent of the streaming rollup (the convergence
    oracle: after a stream drains, the last update per conv_id must
    equal this aggregation of the same rows)."""
    from pyspark.sql import functions as F

    return df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
    )
