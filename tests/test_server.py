"""Long-lived query-server mode (VERDICT r4 'What's missing' #1).

The reference's actual deployment is a resident FastAPI process over a
warm sqlite connection (viewer.py:115-139); ours is a resident
QueryServer over a warm SearchEngine(cache_tables=True). These tests
drive the real HTTP surface with urllib against an ephemeral port."""

import json
import os
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.server import QueryServer, parse_ts_param


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(port, path):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", method="POST", data=b"")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get_err(port, path):
    try:
        _get(port, path)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
    raise AssertionError("expected an HTTP error")


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    from aspublic_spark.tables import synth_transcripts

    idx = str(tmp_path_factory.mktemp("srv") / "idx")
    df = synth_transcripts(spark, 2_000, seed=7)
    b = IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"], text_col="text",
        meta_cols=["role", "tool", "ts"], n_slices=2, block_size=16,
    )
    b.build(df)
    srv = QueryServer(spark, idx, port=0).start()
    yield srv, b, df
    srv.stop()


def test_server_search_matches_engine(served):
    srv, b, df = served
    term = df.first()["text"].lower().split()[0]
    code, payload = _get(srv.port, f"/search?q={term}&k=10")
    assert code == 200
    want = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in srv.engine.search(term, k=10).df.collect()
    ]
    got = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in payload["results"]
    ]
    assert got == want and len(got) == 10
    assert payload["debug"]["dbtime_ms"] >= 0
    assert payload["debug"]["parsed"]["and"] == [term]


def test_server_filters_and_websearch(served):
    srv, b, df = served
    words = df.first()["text"].lower().split()
    t0, t1 = words[0], words[1]
    code, payload = _get(srv.port, f"/search?q={t0}&k=10&role=user")
    assert code == 200
    assert all(r["role"] == "user" for r in payload["results"])
    # websearch OR parses into an or-group
    code, payload = _get(srv.port, f"/search?q={t0}+OR+{t1}&k=5&websearch=1")
    assert code == 200 and payload["debug"]["parsed"]["or"]
    # pure-date after/before go through the reference endpoint coercion
    code, payload = _get(srv.port, f"/search?q={t0}&k=5&after=1970-01-01")
    assert code == 200 and payload["results"]
    code, payload = _get(srv.port, f"/search?q={t0}&k=5&before=1970-01-01")
    assert code == 200 and payload["results"] == []


def test_server_input_validation(served):
    srv, _, _ = served
    code, payload = _get_err(srv.port, "/search?q=x&k=notanint")
    assert code == 400 and "k" in payload["error"]
    code, payload = _get_err(srv.port, "/search?q=x&conv_prefix=a%3Bb")
    assert code == 400 and "conv_prefix" in payload["error"]
    code, payload = _get_err(srv.port, "/search?q=x&after=banana")
    assert code == 400 and "invalid timestamp" in payload["error"]
    code, payload = _get_err(srv.port, "/nope")
    assert code == 404


def test_server_stats_and_health(served):
    srv, _, df = served
    assert _get(srv.port, "/healthz") == (200, {"ok": True})
    code, payload = _get(srv.port, "/stats")
    assert code == 200
    assert payload["stats"][0]["n_docs"] == df.count()
    assert payload["n_requests"] >= 1


def test_server_refresh_picks_up_new_generation(served, spark):
    """The resident engine serves a snapshot; POST /refresh after an
    incremental build must make the new generation visible without a
    restart — the operational loop a real deployment runs."""
    srv, b, df = served
    extra = (
        df.limit(30)
        .withColumn("conv_id", F.concat(F.lit("srvnew_"), F.col("conv_id")))
        .withColumn("text", F.lit("xylophone quorum"))
    )
    b.add_documents(extra, gen=b._next_gen_id())
    # snapshot semantics: invisible until refresh
    code, payload = _get(srv.port, "/search?q=xylophone&k=50")
    assert code == 200 and payload["results"] == []
    assert _post(srv.port, "/refresh") == (200, {"refreshed": True})
    code, payload = _get(srv.port, "/search?q=xylophone&k=50")
    assert code == 200 and len(payload["results"]) == 30


def test_parse_ts_param_semantics():
    import datetime as dt

    assert parse_ts_param(None) is None
    d = parse_ts_param("2023-11-14")
    assert type(d) is dt.date
    t = parse_ts_param("2023-11-14T12:30:00")
    assert isinstance(t, dt.datetime)
    with pytest.raises(ValueError):
        parse_ts_param("banana")


def test_cli_serve_wiring(monkeypatch):
    """The serve subcommand parses and dispatches (the blocking loop is
    stubbed; the real serving path is covered by the fixture above)."""
    from aspublic_spark import cli

    seen = {}
    monkeypatch.setattr(cli, "cmd_serve", lambda args: seen.update(vars(args)) or 0)
    rc = cli.main(["serve", "--index", "/tmp/x", "--port", "0", "--warm", "a,b"])
    assert rc == 0
    assert seen["index"] == "/tmp/x" and seen["port"] == 0 and seen["warm"] == "a,b"
    assert seen["host"] == "127.0.0.1" and seen["no_cache"] is False


def test_server_concurrent_requests(served):
    """A resident server takes overlapping requests: Spark schedules
    jobs from concurrent driver threads safely, and every response must
    equal the single-threaded answer (the engine's caches are
    read-mostly; this pins that no request corrupts another's)."""
    from concurrent.futures import ThreadPoolExecutor

    srv, _, df = served
    words = df.first()["text"].lower().split()
    qs = [words[0], words[1], f"{words[0]} {words[1]}", words[0], words[1]] * 2
    want = {
        q: [
            (r["conv_id"], r["turn_idx"], round(r["score"], 9))
            for r in srv.engine.search(q, k=10).df.collect()
        ]
        for q in set(qs)
    }
    with ThreadPoolExecutor(max_workers=5) as ex:
        payloads = list(
            ex.map(lambda q: (q, _get(srv.port, f"/search?q={q.replace(' ', '+')}&k=10")), qs)
        )
    for q, (code, payload) in payloads:
        assert code == 200
        got = [
            (r["conv_id"], r["turn_idx"], round(r["score"], 9))
            for r in payload["results"]
        ]
        assert got == want[q], q


def test_server_auto_refresh_needs_no_post(spark, tmp_path):
    """VERDICT r4 Next #6: a server started with auto_refresh=True
    serves new generations (and survives prunes) with no POST /refresh
    — the manifest probe per search re-snapshots the engine."""
    from aspublic_spark.tables import synth_transcripts

    idx = str(tmp_path / "auto_idx")
    df = synth_transcripts(spark, 500, seed=11)
    b = IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"], text_col="text",
        meta_cols=["role", "tool", "ts"], n_slices=2, block_size=16,
    )
    b.build(df)
    srv = QueryServer(spark, idx, port=0, auto_refresh=True).start()
    try:
        code, payload = _get(srv.port, "/search?q=quince&k=50")
        assert code == 200 and payload["results"] == []
        extra = (
            df.limit(12)
            .withColumn("conv_id", F.concat(F.lit("auto_"), F.col("conv_id")))
            .withColumn("text", F.lit("quince banquet"))
        )
        b.add_documents(extra, gen=b._next_gen_id())
        code, payload = _get(srv.port, "/search?q=quince&k=50")
        assert code == 200 and len(payload["results"]) == 12
    finally:
        srv.stop()
