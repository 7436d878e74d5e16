#!/usr/bin/env python
"""Extra (non-frozen) bench utilities for the optimization rounds.

`bench.py` is frozen for measurement; everything exploratory lives here:

  python bench_extra.py plans AFTER_SUFFIX   # capture explain("formatted")
                                             # per bench family into
                                             # plans/r06/<family>_<SUFFIX>.txt
  python bench_extra.py time [REPEATS]       # steady-state per-family minima
                                             # (noop-style repeated collect)
  python bench_extra.py entry [REPEATS]      # noop-sink timing of every
                                             # declared entry query (sf from
                                             # $SPARK_GRAFT_SF_DIR)

Same conditions as the frozen bench: materialized sf input, local[32]
(honouring $SPARK_GRAFT_CPUS), engine with cache_tables=True, one
warm-up per plan shape before timing.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import CPUS, QUERY_SET, _build, _materialize_input, _n_turns, _sf_label


def _explain_str(df) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def _engine(spark, idx_dir, **kw):
    from aspublic_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, idx_dir, cache_tables=True, **kw)
    for wq in ("status", "data example", "data !example", '"status update"'):
        eng.search(wq, k=5).df.collect()
    return eng


def _setup():
    from aspublic_spark.functions.tokenizer import tokens_udf
    from aspublic_spark.session import get_spark
    from aspublic_spark.tables import synth_transcripts

    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    df = _materialize_input(spark, _n_turns(), 42, f"{scratch}/bench_input_{_sf_label()}")
    synth_transcripts(spark, 20_000 * CPUS, seed=1).select(tokens_udf("text")).count()
    idx_dir = f"/tmp/bench_idx_extra_{_sf_label()}"
    _build(spark, df, idx_dir)
    return spark, idx_dir


def capture_plans(suffix: str):
    spark, idx_dir = _setup()
    eng = _engine(spark, idx_dir)
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name, q, kw in QUERY_SET:
        res = eng.search(q, k=50, **kw)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(_explain_str(res.df))
        print("wrote", path)
    pruned = _engine(spark, idx_dir, prune_min_postings=0)
    res = pruned.search("the", k=50)
    assert res.pruning.get("theta_pruned"), "block-max did not fire"
    path = os.path.join(out_dir, f"q_heavy_blockmax_{suffix}.txt")
    with open(path, "w") as f:
        f.write(_explain_str(res.df))
    print("wrote", path)


def time_families(repeats: int = 5):
    spark, idx_dir = _setup()
    eng = _engine(spark, idx_dir)
    mins = {}
    for name, q, kw in QUERY_SET:
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            eng.search(q, k=50, **kw).df.collect()
            ts.append(time.time() - t0)
        mins[name] = round(min(ts), 3)
        print(name, [round(t, 3) for t in ts])
    pruned = _engine(spark, idx_dir, prune_min_postings=0)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        pruned.search("the", k=50).df.collect()
        ts.append(time.time() - t0)
    mins["q_heavy_blockmax"] = round(min(ts), 3)
    print("q_heavy_blockmax", [round(t, 3) for t in ts])
    print("MINIMA", mins)


def time_entry(repeats: int = 2):
    """noop-sink cold/steady timing of every declared entry query."""
    import importlib.util

    from aspublic_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    spark = get_spark("bench_extra_entry", cpus=CPUS, shuffle_partitions=CPUS)
    data_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    rows = {}
    for name, fn in mod.queries().items():
        spark.sparkContext.setJobDescription(f"entry:{name}")
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, data_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        rows[name] = ts
        print(name, ts, flush=True)
    spark.sparkContext.setJobDescription(None)
    print("ENTRY", rows)


def sf1_decade(n_turns: int = 2_000_000):
    """One decade above the frozen bench's sf0.1 corpus: build 2M turns
    and run the same query families with the same single-shot protocol
    (one warm-up per plan shape, one timed shot per family, fresh
    engine for the forced-blockmax datapoint). Grounds the scale
    claims (threshold-gated pruning, auto n_slices, broadcast bounds)
    with measurement instead of plan reasoning. bench.py is frozen, so
    this lives here; cite results in OPTIMIZATION_r06.md."""
    from aspublic_spark.functions.tokenizer import tokens_udf
    from aspublic_spark.query.engine import SearchEngine
    from aspublic_spark.session import get_spark
    from aspublic_spark.tables import synth_transcripts

    spark = get_spark("bench_extra_sf1", cpus=CPUS, shuffle_partitions=CPUS)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    df = _materialize_input(spark, n_turns, 42, f"{scratch}/bench_input_sf1")
    synth_transcripts(spark, 20_000 * CPUS, seed=1).select(tokens_udf("text")).count()
    idx_dir = "/tmp/bench_idx_extra_sf1"
    build_secs = min(_build(spark, df, idx_dir) for _ in range(2))
    print(f"sf1 build: {build_secs:.2f}s = {n_turns/build_secs:.0f} turns/sec", flush=True)
    eng = _engine(spark, idx_dir)
    out = {}
    for name, q, kw in QUERY_SET:
        t0 = time.time()
        eng.search(q, k=50, **kw).df.collect()
        out[name] = round(time.time() - t0, 3)
        print(name, out[name], flush=True)
    pruned = SearchEngine(spark, idx_dir, cache_tables=True, prune_min_postings=0)
    t0 = time.time()
    res = pruned.search("the", k=50)
    res.df.collect()
    out["q_heavy_blockmax"] = round(time.time() - t0, 3)
    assert res.pruning.get("theta_pruned"), "block-max did not fire"
    # does the DEFAULT threshold auto-enable pruning at this volume?
    dflt = SearchEngine(spark, idx_dir, cache_tables=True)
    auto = dflt.search("the", k=50)
    auto.df.collect()
    out["default_pruning_fired"] = bool(auto.pruning.get("theta_pruned"))
    print("SF1", {"build_s": round(build_secs, 2), "tps": round(n_turns / build_secs), **out})


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "plans":
        capture_plans(sys.argv[2] if len(sys.argv) > 2 else "after")
    elif cmd == "time":
        time_families(int(sys.argv[2]) if len(sys.argv) > 2 else 5)
    elif cmd == "entry":
        time_entry(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    elif cmd == "sf1":
        sf1_decade(int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000)
    else:
        raise SystemExit(f"unknown command {cmd}")
