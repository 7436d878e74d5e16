"""Two-field index + per-field BM25 weighting.

The reference indexes BOTH text and subject (`fts5(text, subject, ...)`,
common/db_sqlite.py:27; triggers insert both fields, :29-41), so a
match in the content-warning line is retrievable and FTS5's
`bm25(fts, w1, w2)` can weight fields. Semantics implemented here (and
mirrored by the DuckDB oracle in __spark_entry__): per-field df, tf,
dl and avgdl (denominated over ALL docs, like FTS5 per-column norms);
score = sum_f w_f * BM25_f; a term qualifies if it matches in ANY
field; phrases match within a single field only.
"""

import math
import os

import pytest
from pyspark.sql import functions as F

from aspublic_spark.functions.tokenizer import tokenize
from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.query.engine import SearchEngine

ROWS = [
    # (conv_id, turn_idx, text, subject)
    ("c1", 0, "this is a sample status", ""),
    ("c1", 1, "this is a sample reply about topics", "warning politics"),
    ("c1", 2, "this is a sample media status", "warning violence"),
    ("c1", 3, "another example status entirely", "politics discussion"),
    ("c1", 4, "an example with keyword content", ""),
    ("c1", 5, "politics appears in the body here", ""),
]


@pytest.fixture(scope="module")
def engine2(spark, workdir):
    idx = os.path.join(workdir, "twofield_idx")
    df = spark.createDataFrame(
        [(c, i, t, s, 1700000000 + i) for c, i, t, s in ROWS],
        "conv_id string, turn_idx int, text string, subject string, e long",
    ).withColumn("ts", F.timestamp_seconds("e")).drop("e")
    IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"],
        text_cols=["text", "subject"], meta_cols=["ts"],
        n_slices=2, block_size=4,
    ).build(df)
    return SearchEngine(spark, idx)


def _naive_two_field(query_terms, weights=(1.0, 1.0)):
    """Mini oracle: per-field BM25 with AND-across-fields qualification."""
    fields = [
        [tokenize(t) for _, _, t, _ in ROWS],
        [tokenize(s) for _, _, _, s in ROWS],
    ]
    n = len(ROWS)
    avg = [sum(len(d) for d in fl) / n for fl in fields]
    out = {}
    for i in range(n):
        total, matched = 0.0, set()
        for t in query_terms:
            for f, fl in enumerate(fields):
                tf = fl[i].count(t)
                if not tf:
                    continue
                matched.add(t)
                dfv = sum(1 for d in fl if t in d)
                idf = math.log((n - dfv + 0.5) / (dfv + 0.5) + 1.0)
                dl = len(fl[i])
                total += (
                    weights[f]
                    * idf
                    * tf * 2.2
                    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg[f]))
                )
        if matched == set(query_terms):
            out[ROWS[i][1]] = total
    return out


def _got(engine2, q, **kw):
    return {
        r["turn_idx"]: r["score"] for r in engine2.search(q, k=10, **kw).df.collect()
    }


def test_subject_only_match_is_retrievable(engine2):
    got = _got(engine2, "warning")
    assert sorted(got) == [1, 2]  # 'warning' never appears in text


def test_cross_field_and(engine2):
    # 'sample' from text, 'politics' from subject: only turn 1 has both
    got = _got(engine2, "sample politics")
    assert sorted(got) == [1]


def test_two_field_scores_match_naive_oracle(engine2):
    for q in ["warning", "politics", "sample politics", "status"]:
        want = _naive_two_field(q.split())
        got = _got(engine2, q)
        assert sorted(got) == sorted(want), q
        for turn, s in want.items():
            assert abs(got[turn] - s) < 1e-9, (q, turn)


def test_field_weights(engine2):
    # weight 2.0 on subject: per-(term,field) contributions scale exactly
    want = _naive_two_field(["politics"], weights=(1.0, 2.0))
    got = _got(engine2, "politics", field_weights=[1.0, 2.0])
    assert sorted(got) == sorted(want)
    for turn, s in want.items():
        assert abs(got[turn] - s) < 1e-9
    # zero weight: subject matches still qualify but contribute 0
    got0 = _got(engine2, "warning", field_weights=[1.0, 0.0])
    assert sorted(got0) == [1, 2] and all(v == 0.0 for v in got0.values())


def test_phrase_does_not_span_fields(engine2):
    # 'entirely politics' is adjacent only across the text/subject
    # boundary of turn 3 — a phrase must NOT match across fields
    assert engine2.search('"entirely politics"').df.count() == 0
    # but a phrase inside the subject field matches
    got = _got(engine2, '"warning politics"')
    assert sorted(got) == [1]


def test_single_field_index_unchanged(spark, workdir):
    # a text-only build over the same rows must not see subject matches
    idx = os.path.join(workdir, "onefield_idx")
    df = spark.createDataFrame(
        [(c, i, t, s, 1700000000 + i) for c, i, t, s in ROWS],
        "conv_id string, turn_idx int, text string, subject string, e long",
    ).withColumn("ts", F.timestamp_seconds("e")).drop("e")
    IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"], text_col="text",
        meta_cols=["ts"], n_slices=2, block_size=4,
    ).build(df)
    eng = SearchEngine(spark, idx)
    assert eng.search("warning").df.count() == 0
    assert eng.search("politics").df.count() == 1  # body occurrence only


def test_two_field_pruning_lossless(engine2):
    """Block-max theta + doc-range pruning with per-(term, field) upper
    bounds must stay lossless on the two-field index."""
    pruned = SearchEngine(engine2.spark, engine2.index_dir, prune_min_postings=0)
    for q in ["politics", "sample politics", "warning status", "status"]:
        a = [
            (r["turn_idx"], round(r["score"], 9))
            for r in pruned.search(q, block_max=True).df.collect()
        ]
        b = [
            (r["turn_idx"], round(r["score"], 9))
            for r in engine2.search(q, block_max=False).df.collect()
        ]
        assert a == b, q
