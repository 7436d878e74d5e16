"""Round-3 correctness fixes (ADVICE r2 + VERDICT r2 'what's missing').

- retention prune must never fast-drop a generation containing NULL-ts
  docs ('retention must never delete what it cannot date');
- the streaming dedup horizon must keep NULL-ts keys in scope forever
  (they have no date to age out by);
- date endpoints: a pure `date` for before/after coerces exactly like
  the reference (db_sqlite.py:85-98): before -> that day's midnight,
  after -> that day's end-of-day, strict comparisons (a pure-date range
  excludes both endpoint days).
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.query.engine import SearchEngine

NULLABLE_TS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _rows(spec):
    return [
        (cid, ti, "user", text, None, ts) for (cid, ti, text, ts) in spec
    ]


def _build(spark, idx, rows):
    df = spark.createDataFrame(rows, NULLABLE_TS_SCHEMA)
    b = IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"], text_col="text",
        meta_cols=["role", "tool", "ts"], n_slices=2, block_size=8,
    )
    b.build(df)
    return b


def test_prune_keeps_null_ts_docs_in_all_old_generation(spark, workdir):
    """A generation whose every DATED doc is older than the cutoff must
    not be directory-dropped when it also holds NULL-ts docs."""
    idx = os.path.join(workdir, "prune_null_idx")
    old = dt.datetime(2020, 1, 1)
    rows = _rows(
        [
            ("a", 0, "ancient words here", old),
            ("a", 1, "more ancient words", old),
            ("b", 0, "undated survivor words", None),
        ]
    )
    b = _build(spark, idx, rows)
    out = b.prune_index(dt.datetime(2021, 1, 1))
    assert out["pruned"] is True
    assert out["dropped"] == []  # NULL-ts doc forces the rewrite path
    assert out["rewritten"] == [0]
    eng = SearchEngine(spark, idx)
    assert eng.search("survivor").df.count() == 1
    assert eng.search("ancient").df.count() == 0
    # stats shrank to the surviving doc only
    assert eng.n_docs == 1


def test_prune_fast_drops_generation_without_null_ts(spark, workdir):
    idx = os.path.join(workdir, "prune_drop_idx")
    old = dt.datetime(2020, 1, 1)
    rows = _rows(
        [("a", 0, "ancient words", old), ("a", 1, "ancient words", old)]
    )
    b = _build(spark, idx, rows)
    out = b.prune_index(dt.datetime(2021, 1, 1))
    assert out["dropped"] == [0] and out["rewritten"] == []


def test_null_ts_redelivery_not_double_indexed(spark, workdir):
    """A NULL-ts doc redelivered inside the dedup horizon must be
    anti-joined away even though the horizon filter is date-based."""
    from aspublic_spark.streaming.ingest import StreamingIngest

    idx = os.path.join(workdir, "ing_null_idx")
    docs = os.path.join(workdir, "ing_null_docs")
    ing = StreamingIngest(
        spark, idx, docs, dedup_horizon_days=7,
        index_kwargs={"n_slices": 2, "block_size": 8},
    )
    now = dt.datetime(2024, 6, 1, 12, 0, 0)
    b1 = spark.createDataFrame(
        _rows([("n", 0, "nullkey words", None), ("d", 0, "dated words", now)]),
        NULLABLE_TS_SCHEMA,
    )
    assert ing.ingest_batch(b1) == 2
    # redelivery of the NULL-ts doc plus one genuinely new doc
    b2 = spark.createDataFrame(
        _rows([("n", 0, "nullkey words", None), ("e", 0, "fresh words", now)]),
        NULLABLE_TS_SCHEMA,
    )
    assert ing.ingest_batch(b2) == 1  # only the fresh doc survives dedup
    idx_docs = spark.read.parquet(os.path.join(idx, "docs"))
    assert idx_docs.filter((F.col("conv_id") == "n")).count() == 1


@pytest.fixture(scope="module")
def date_idx(spark, workdir):
    idx = os.path.join(workdir, "date_idx")
    rows = _rows(
        [
            ("c1", 0, "marker words", dt.datetime(2024, 1, 1, 23, 59, 59)),
            ("c2", 0, "marker words", dt.datetime(2024, 1, 2, 0, 0, 0)),
            ("c3", 0, "marker words", dt.datetime(2024, 1, 2, 12, 0, 0)),
            ("c4", 0, "marker words", dt.datetime(2024, 1, 3, 0, 0, 0)),
        ]
    )
    _build(spark, idx, rows)
    return SearchEngine(spark, idx)


def _convs(res):
    return sorted(r["conv_id"] for r in res.df.collect())


def test_after_pure_date_excludes_that_whole_day(date_idx):
    # after=2024-01-02 (date) -> ts > 2024-01-02T23:59:59.999999
    res = date_idx.search("marker", after=dt.date(2024, 1, 2))
    assert _convs(res) == ["c4"]


def test_before_pure_date_excludes_that_whole_day(date_idx):
    # before=2024-01-02 (date) -> ts < 2024-01-02T00:00:00
    res = date_idx.search("marker", before=dt.date(2024, 1, 2))
    assert _convs(res) == ["c1"]


def test_datetime_endpoints_stay_strict_uncoerced(date_idx):
    res = date_idx.search("marker", after=dt.datetime(2024, 1, 2, 0, 0, 0))
    assert _convs(res) == ["c3", "c4"]
    res = date_idx.search(
        "marker",
        after=dt.date(2024, 1, 1),
        before=dt.date(2024, 1, 3),
    )
    # pure-date range excludes BOTH endpoint days (reference semantics)
    assert _convs(res) == ["c2", "c3"]
