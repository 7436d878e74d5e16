"""Commit-protocol crash safety through the filesystem seam (fsio.py).

The protocol must hold on stores with NO atomic directory rename
(S3/GCS/ABFS): it is written against single-file atomic writes +
consistent listing only. ``FaultInjectingFS`` kills the builder before
the k-th mutating filesystem operation; the sweep replays compaction
and retention-prune from EVERY such crash point and asserts that
``repair()`` + a retried call converge to the uninterrupted result —
no lost docs, no duplicates, no orphan state.

``HadoopFS`` is exercised end-to-end over a ``file:`` URI (same Hadoop
FileSystem API a cluster uses for hdfs:// and s3a://).
"""

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F

from aspublic_spark.index.build import IndexBuilder, live_gens
from aspublic_spark.index.fsio import (
    CrashError,
    FaultInjectingFS,
    HadoopFS,
    LocalFS,
    fs_for,
)
from aspublic_spark.query.engine import SearchEngine
from aspublic_spark.tables import synth_transcripts


def _builder(spark, idx, fs=None):
    return IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"], text_col="text",
        meta_cols=["role", "tool", "ts"], n_slices=2, block_size=8, fs=fs,
    )


def _snapshot(spark, idx):
    eng = SearchEngine(spark, idx)
    rows = sorted(
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in eng.search("the", k=100).df.collect()
    )
    return eng.n_docs, rows


@pytest.fixture(scope="module")
def three_gen_index(spark, workdir):
    """A pristine 3-generation index, copied per crash-sweep iteration."""
    idx = os.path.join(workdir, "fsio_pristine")
    df = synth_transcripts(spark, 48, seed=11)
    b = _builder(spark, idx)
    b.build(df.filter(F.col("conv_id") < "c000000002"), gen=0)
    b.add_documents(
        df.filter((F.col("conv_id") >= "c000000002") & (F.col("conv_id") < "c000000004")),
        gen=1,
    )
    b.add_documents(df.filter(F.col("conv_id") >= "c000000004"), gen=2)
    return idx


def test_local_fs_primitives(workdir):
    fs = LocalFS()
    d = os.path.join(workdir, "lfs")
    fs.makedirs(os.path.join(d, "sub"))
    assert fs.isdir(d) and fs.listdir(d) == ["sub"]
    fs.write_json_atomic(os.path.join(d, "m.json"), {"a": 1})
    assert fs.read_json(os.path.join(d, "m.json")) == {"a": 1}
    # overwrite is atomic too (replaces content, no partial state)
    fs.write_json_atomic(os.path.join(d, "m.json"), {"a": 2})
    assert fs.read_json(os.path.join(d, "m.json"))["a"] == 2
    assert fs.listdir(os.path.join(d, "missing")) == []
    fs.delete(os.path.join(d, "m.json"))
    fs.delete(os.path.join(d, "missing.json"))  # no-op
    assert not fs.exists(os.path.join(d, "m.json"))
    fs.delete(d, recursive=True)
    assert not fs.exists(d)


def test_fs_for_scheme_routing(spark):
    assert isinstance(fs_for("/tmp/x"), LocalFS)
    assert isinstance(fs_for("file:/tmp/x", spark), HadoopFS)
    with pytest.raises(ValueError):
        fs_for("s3a://bucket/x")  # URI without a SparkSession


def test_compact_crash_sweep(spark, workdir, three_gen_index):
    """Kill compaction before EVERY mutating fs operation; repair + retry
    must always converge to the uninterrupted compaction's exact state."""
    ref = os.path.join(workdir, "fsio_ref")
    shutil.rmtree(ref, ignore_errors=True)
    shutil.copytree(three_gen_index, ref)
    _builder(spark, ref).compact()
    expected = _snapshot(spark, ref)

    budget = 0
    completed = False
    while not completed:
        idx = os.path.join(workdir, "fsio_sweep")
        shutil.rmtree(idx, ignore_errors=True)
        shutil.copytree(three_gen_index, idx)
        fis = FaultInjectingFS(LocalFS(), budget)
        try:
            _builder(spark, idx, fs=fis).compact()
            completed = True
        except CrashError:
            pass
        # recovery with a healthy filesystem
        b2 = _builder(spark, idx)
        b2.repair()
        if len(b2._live_gens()) > 1:
            b2.compact()  # crash happened before the point of no return
        assert len(b2._live_gens()) == 1, f"budget={budget}"
        assert _snapshot(spark, idx) == expected, f"budget={budget}"
        budget += 4  # crash points between ops of the same class behave alike
    assert budget >= 8  # sanity: the sweep actually exercised crash points


def test_prune_crash_sweep(spark, workdir):
    """Same sweep for retention prune (drop one gen, rewrite one gen)."""

    def mk(idx):
        shutil.rmtree(idx, ignore_errors=True)
        rows = [
            ("old", i, "user", "the ancient words", None,
             dt.datetime(2020, 1, 1, i)) for i in range(6)
        ] + [
            ("mid", i, "user", "the boundary words", None,
             dt.datetime(2020, 12, 31, 20) + dt.timedelta(hours=i)) for i in range(6)
        ]
        schema = (
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        b = _builder(spark, idx)
        b.build(spark.createDataFrame(rows[:6], schema), gen=0)
        b.add_documents(spark.createDataFrame(rows[6:], schema), gen=1)
        return b

    cutoff = dt.datetime(2021, 1, 1)
    ref = os.path.join(workdir, "fsio_prune_ref")
    mk(ref).prune_index(cutoff)
    expected = _snapshot(spark, ref)
    assert expected[0] == 2  # 2 mid-gen docs at/after the cutoff survive

    budget = 0
    completed = False
    while not completed:
        idx = os.path.join(workdir, "fsio_prune_sweep")
        b = mk(idx)
        b.fs = FaultInjectingFS(LocalFS(), budget)
        try:
            b.prune_index(cutoff)
            completed = True
        except CrashError:
            pass
        b2 = _builder(spark, idx)
        b2.repair()
        b2.prune_index(cutoff)  # retry (no-op if roll-forward finished)
        assert _snapshot(spark, idx) == expected, f"budget={budget}"
        budget += 4
    assert budget >= 8


def test_orphan_generation_dirs_are_garbage_collected(spark, workdir):
    """Data directories without a raw manifest (a job that died before
    its commit) are invisible to queries and reclaimed by repair()."""
    idx = os.path.join(workdir, "fsio_orphan")
    _builder(spark, idx).build(synth_transcripts(spark, 24, seed=3))
    before = _snapshot(spark, idx)
    # fake a crashed writer: partial data for a never-committed gen 7
    for sub in ("docs", "postings"):
        src = os.path.join(idx, sub, "gen=0")
        shutil.copytree(src, os.path.join(idx, sub, "gen=7"))
    assert _snapshot(spark, idx) == before  # invisible to the engine
    rep = _builder(spark, idx).repair()
    assert any("gen=7" in g for g in rep["gc"])
    assert not os.path.isdir(os.path.join(idx, "docs", "gen=7"))
    assert live_gens(idx) == [0]
    assert _snapshot(spark, idx) == before


def test_repair_skips_uncommitted_raw_stage(spark, workdir):
    """repair() must never build derived state (gendict) over a
    generation that never committed its raw manifest — a crashed build's
    packed output and sub-stage manifests are garbage, not a live gen
    (ADVICE r2 lineage; the raw manifest is now the generation's LAST
    commit, so stray gendict/pack manifests are reclaimed too)."""
    idx = os.path.join(workdir, "fsio_partial_raw")
    _builder(spark, idx).build(synth_transcripts(spark, 24, seed=5))
    shutil.copytree(
        os.path.join(idx, "postings", "gen=0"),
        os.path.join(idx, "postings", "gen=1"),
    )
    # a crashed build may even have committed gen-1 sub-stage manifests
    shutil.copy(
        os.path.join(idx, "manifest", "pack_g0.json"),
        os.path.join(idx, "manifest", "pack_g1.json"),
    )
    rep = _builder(spark, idx).repair()
    assert not os.path.exists(os.path.join(idx, "manifest", "gendict_g1.json"))
    assert not os.path.exists(os.path.join(idx, "manifest", "pack_g1.json"))
    assert not os.path.isdir(os.path.join(idx, "postings", "gen=1"))
    assert any("gen=1" in g for g in rep["gc"])


def test_staged_batch_without_success_is_discarded(spark, workdir):
    """ADVICE r2: a staging dir with only Spark's _temporary scratch (the
    staging write itself crashed) must be discarded by recover(), not
    read — the at-least-once source redelivers the batch."""
    from aspublic_spark.streaming.ingest import StreamingIngest

    idx = os.path.join(workdir, "fsio_staged_idx")
    docs = os.path.join(workdir, "fsio_staged_docs")
    ing = StreamingIngest(
        spark, idx, docs, index_kwargs={"n_slices": 2, "block_size": 8}
    )
    base = synth_transcripts(spark, 16, seed=9)
    assert ing.ingest_batch(base) == 16
    # fake an interrupted staging write: no _SUCCESS, only scratch
    broken = os.path.join(docs + "_staging", "gen_9")
    os.makedirs(os.path.join(broken, "_temporary"))
    with open(os.path.join(broken, "part-00000.snappy.parquet"), "wb") as f:
        f.write(b"not parquet")
    ing.recover()  # must not raise
    assert not os.path.isdir(broken)
    assert SearchEngine(spark, idx).n_docs == 16


def test_hadoop_fs_end_to_end_over_file_uri(spark, workdir):
    """Build + incremental add + compact + search with every protocol
    operation going through the Hadoop FileSystem API (file:// here;
    the same code path serves hdfs:// and s3a:// on a cluster)."""
    local_idx = os.path.join(workdir, "hfs_idx")
    idx = "file:" + local_idx
    df = synth_transcripts(spark, 32, seed=13)
    b = _builder(spark, idx)
    b.build(df.filter(F.col("conv_id") < "c000000002"), gen=0)
    b.add_documents(df.filter(F.col("conv_id") >= "c000000002"), gen=1)
    assert isinstance(b.fs, HadoopFS)
    eng = SearchEngine(spark, idx)
    assert isinstance(eng.fs, HadoopFS)
    assert eng.n_docs == 32
    n_the = eng.search("the", k=100).df.count()
    assert n_the > 0
    assert b.compact()["compacted"]
    eng.refresh()
    assert eng.n_docs == 32
    assert eng.search("the", k=100).df.count() == n_the
    # parity with a plain-path build over the same data
    plain = os.path.join(workdir, "hfs_plain")
    _builder(spark, plain).build(df)
    assert _snapshot(spark, plain)[1] == sorted(
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in eng.search("the", k=100).df.collect()
    )


def test_build_crash_sweep(spark, workdir):
    """Kill an incremental build before EVERY mutating fs operation of
    the manifest protocol; repair + a retried build must converge to
    the uninterrupted result (a generation commits all-or-nothing: its
    raw manifest is written LAST, so every crash point leaves either a
    fully-live generation or invisible garbage)."""
    df = synth_transcripts(spark, 30, seed=13)
    base = df.filter(F.col("conv_id") < "c000000002")
    batch = df.filter(F.col("conv_id") >= "c000000002")

    ref = os.path.join(workdir, "fsio_build_ref")
    rb = _builder(spark, ref)
    rb.build(base, gen=0)
    rb.add_documents(batch, gen=1)
    expected = _snapshot(spark, ref)

    budget = 0
    completed = False
    while not completed:
        idx = os.path.join(workdir, "fsio_build_sweep")
        shutil.rmtree(idx, ignore_errors=True)
        b = _builder(spark, idx)
        b.build(base, gen=0)
        b.fs = FaultInjectingFS(LocalFS(), budget)
        try:
            b.add_documents(batch, gen=1)
            completed = True
        except CrashError:
            pass
        # recovery with a healthy filesystem: repair (GC + heal), retry
        b2 = _builder(spark, idx)
        b2.repair()
        b2.add_documents(batch, gen=1)
        assert sorted(b2._live_gens()) == [0, 1], f"budget={budget}"
        assert _snapshot(spark, idx) == expected, f"budget={budget}"
        budget += 1
    assert budget >= 4  # sanity: the sweep exercised real crash points
