"""S2/S3/S4/I2: HTTP fallback source, endpoint discovery, domain
auto-discovery, reblog unwrap.

The reference's versions are connectivity code (collector.py:434-457,
:616-714, :78-80); these tests drive the Spark analogs against real
local HTTP servers (stdlib ThreadingHTTPServer) — no network beyond
loopback, no mocks on the read path."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from aspublic_spark.functions.json_hooks import normalize_status_json, unwrap_reblogs
from aspublic_spark.sources import (
    SourceRegistry,
    discover_domains,
    read_http_jsonl,
    probe_endpoint,
)


class _Routes:
    """Mutable path -> (code, body, headers) table shared with a server."""

    def __init__(self, routes=None):
        self.routes = dict(routes or {})
        self.lock = threading.Lock()

    def set(self, path, code, body, headers=None):
        with self.lock:
            self.routes[path] = (code, body, headers or {})

    def get(self, path):
        with self.lock:
            return self.routes.get(path)


def _serve(routes: _Routes):
    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            r = routes.get(self.path)
            if r is None:
                self.send_error(404, "nope")
                return
            code, body, headers = r
            body = body.encode() if isinstance(body, str) else body
            self.send_response(code)
            for k, v in headers.items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _jsonl(rows):
    return "\n".join(json.dumps(r) for r in rows)


def _row(conv, i, text, ts="2026-01-02T03:04:05+00:00"):
    return {
        "conv_id": conv,
        "turn_idx": i,
        "role": "user",
        "text": text,
        "tool": None,
        "ts": ts,
    }


@pytest.fixture()
def http():
    routes = _Routes()
    srv, base = _serve(routes)
    yield routes, base
    srv.shutdown()


# ---------------------------------------------------------------- S2


def test_http_jsonl_batch_reads_all_urls_in_parallel_partitions(spark, http):
    routes, base = http
    routes.set("/a.jsonl", 200, _jsonl([_row("c1", 0, "alpha"), _row("c1", 1, "beta")]))
    routes.set("/b.jsonl", 200, _jsonl([_row("c2", 0, "gamma", ts=1700000000)]))
    df = read_http_jsonl(spark, [f"{base}/a.jsonl", f"{base}/b.jsonl"])
    assert df.rdd.getNumPartitions() == 2  # one per endpoint
    rows = {(r["conv_id"], r["turn_idx"]): r for r in df.collect()}
    assert len(rows) == 3
    assert rows[("c1", 1)]["text"] == "beta"
    # epoch + ISO timestamps both normalize (I8 semantics)
    assert rows[("c2", 0)]["ts"].year == 2023
    assert rows[("c1", 0)]["ts"].isoformat() == "2026-01-02T03:04:05"


def test_http_jsonl_skips_bad_lines_unless_strict(spark, http):
    routes, base = http
    body = _jsonl([_row("c1", 0, "ok")]) + "\nnot json at all\n" + _jsonl(
        [{"conv_id": "c1", "role": "user"}]  # missing required fields
    )
    routes.set("/x.jsonl", 200, body)
    url = f"{base}/x.jsonl"
    assert read_http_jsonl(spark, [url]).count() == 1
    with pytest.raises(Exception):
        read_http_jsonl(spark, [url], strict=True).collect()


def test_http_jsonl_stream_offsets_only_deliver_new_lines(spark, http, workdir):
    import os
    import time

    routes, base = http
    rows1 = [_row("s1", i, f"first batch {i}") for i in range(3)]
    routes.set("/feed", 200, _jsonl(rows1))
    url = f"{base}/feed"

    stream = read_http_jsonl(spark, [url], stream=True)
    q = (
        stream.writeStream.format("memory")
        .queryName("http_feed")
        .option("checkpointLocation", os.path.join(workdir, "http_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def wait_count(n, sec=60):
            for _ in range(sec * 4):
                if spark.sql("select * from http_feed").count() >= n:
                    return True
                time.sleep(0.25)
            return False

        assert wait_count(3)
        # append 2 lines; ONLY those arrive (offset = line count)
        routes.set("/feed", 200, _jsonl(rows1 + [_row("s1", 3, "late"), _row("s1", 4, "later")]))
        assert wait_count(5)
        got = spark.sql("select conv_id, turn_idx from http_feed").collect()
        assert sorted(r["turn_idx"] for r in got) == [0, 1, 2, 3, 4]
    finally:
        q.stop()


# ---------------------------------------------------------------- S3


def test_endpoint_probe_success_strips_public_suffix(http):
    routes, base = http
    routes.set("/api/v1/streaming/public", 200, "ok")
    ok, url = probe_endpoint(base)
    assert ok and url == f"{base}/api/v1/streaming"


def test_endpoint_probe_falls_through_5xx_to_next_candidate(http):
    routes, base = http
    routes.set("/api/v1/streaming/public", 503, "boom")
    routes.set("/api/v1/streaming", 200, "ok")
    ok, url = probe_endpoint(base)
    assert ok and url == f"{base}/api/v1/streaming"


def test_endpoint_probe_auth_required_gives_up(http):
    routes, base = http
    routes.set("/api/v1/streaming/public", 401, "error: Missing access token")
    ok, url = probe_endpoint(base)
    assert (ok, url) == (False, None)


def test_endpoint_probe_dead_host_and_exhausted_paths(http):
    routes, base = http
    routes.set("/api/v1/streaming/public", 500, "x")
    routes.set("/api/v1/streaming", 500, "x")
    assert probe_endpoint(base) == (False, None)
    assert probe_endpoint("http://127.0.0.1:1", timeout=0.5) == (False, None)


def test_endpoint_probe_restarts_on_cross_host_redirect(http):
    routes, base = http
    routes2 = _Routes({"/api/v1/streaming/public": (200, "ok", {})})
    srv2, base2 = _serve(routes2)
    try:
        # 127.0.0.1:portA redirects to 127.0.0.1:portB (different netloc)
        routes.set(
            "/api/v1/streaming/public",
            302,
            "",
            {"Location": f"{base2}/api/v1/streaming/public"},
        )
        ok, url = probe_endpoint(base)
        assert ok and url == f"{base2}/api/v1/streaming"
    finally:
        srv2.shutdown()


# ---------------------------------------------------------------- S4


def test_discover_domains_known_excluded_capped(spark):
    urls = (
        [f"host{i}.example/p/{i}" for i in range(8)]
        + ["known.net/x", "spam.badcorp/y", "https://scheme.example/z"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["domain"]
        for r in discover_domains(
            df, "url", known={"known.net"}, excluded_suffixes=(".badcorp",), max_kickoffs=5
        ).collect()
    ]
    # deterministic smallest-first cap; known + excluded never appear
    assert got == sorted([f"host{i}.example" for i in range(8)] + ["scheme.example"])[:5]


def test_source_registry_tick_records_reference_status_codes(spark):
    calls = []

    def prober(domain, candidates):
        calls.append(domain)
        return (True, f"https://{domain}/api/v1/streaming") if "good" in domain else (False, None)

    reg = SourceRegistry(prober=prober, max_kickoffs=10)
    df = spark.createDataFrame(
        [("good-a.example/1",), ("bad-b.example/2",), ("good-a.example/3",)], "url string"
    )
    live = reg.tick(df)
    assert live == ["good-a.example"]
    assert reg.status == {"good-a.example": 2, "bad-b.example": -2}
    assert reg.live_endpoints == ["https://good-a.example/api/v1/streaming"]
    # second tick: nothing new -> no probes
    n = len(calls)
    assert reg.tick(df) == [] and len(calls) == n


def test_source_registry_end_to_end_against_live_server(spark, http):
    """S4 feeding S3 feeding S2: a domain discovered in a batch is
    health-tested against a REAL server and its endpoint then serves
    rows through the http_jsonl source."""
    routes, base = http
    routes.set("/api/v1/streaming/public", 200, "ok")
    routes.set(
        "/api/v1/streaming", 200, _jsonl([_row("cD", 0, "discovered hello")])
    )
    host = base.removeprefix("http://")
    reg = SourceRegistry(candidates=("/api/v1/streaming/public",))
    reg._prober = lambda d, c: probe_endpoint(f"http://{d}", c)
    df = spark.createDataFrame([(f"{host}/users/a/status/1",)], "url string")
    assert reg.tick(df) == [host]
    out = read_http_jsonl(spark, reg.live_endpoints)
    assert [r["text"] for r in out.collect()] == ["discovered hello"]


# ---------------------------------------------------------------- I2


def test_unwrap_reblogs_replaces_wrapper_with_original(spark):
    orig = {
        "url": "https://a.example/users/x/1",
        "content": "<p>original words</p>",
        "created_at": "2026-01-01T00:00:00Z",
        "reblog": None,
    }
    wrapper = {
        "url": "https://b.example/users/y/2",
        "content": "",
        "created_at": "2026-01-02T00:00:00Z",
        "reblog": orig,
    }
    double = {"url": "https://c.example/3", "content": "", "reblog": wrapper}
    plain = {
        "url": "https://d.example/4",
        "content": "<p>not a boost</p>",
        "created_at": "2026-01-03T00:00:00Z",
        "reblog": None,
    }
    df = spark.createDataFrame(
        [(json.dumps(o),) for o in (wrapper, double, plain)], "value string"
    )
    out = normalize_status_json(unwrap_reblogs(df)).collect()
    by_url = {r["url"]: r for r in out}
    # both boost shapes collapse to the ORIGINAL status; the plain one survives
    assert set(by_url) == {"a.example/users/x/1", "d.example/4"}
    assert by_url["a.example/users/x/1"]["text"].strip() == "original words"
    assert len(out) == 3  # dedup of the two identical originals is downstream (I9)


# ---------------------------------------------------------------- I10


def test_realign_fields_by_name(spark):
    from pyspark.sql import functions as F

    from aspublic_spark.tables import TRANSCRIPTS_SCHEMA, realign_fields

    # scrambled order, different casing, epoch-long ts, extra column
    src = spark.createDataFrame(
        [(7, "hello world", "extra", "user", 1700000000, "c9")],
        "TURN_IDX long, text string, junk string, role string, "
        "ts long, Conv_Id string",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    out = realign_fields(src)
    assert out.columns == [f.name for f in TRANSCRIPTS_SCHEMA.fields]
    r = out.first()
    assert (r["conv_id"], r["turn_idx"], r["tool"]) == ("c9", 7, None)
    assert out.schema["turn_idx"].dataType.simpleString() == "int"

    import pytest as _pt

    with _pt.raises(ValueError, match="required field 'text'"):
        realign_fields(src.drop("text"))
    with _pt.raises(ValueError, match="unexpected columns"):
        realign_fields(src, strict=True)


def test_realign_fields_canonical_passthrough_plan_unchanged(spark):
    from aspublic_spark.tables import fixture_transcripts, realign_fields

    df = fixture_transcripts(spark)
    plan = realign_fields(df)._jdf.queryExecution().optimizedPlan().toString()
    # no-op casts elided: no Cast survives in the optimized plan
    assert "cast(" not in plan.lower()
    assert realign_fields(df).collect() == df.collect()


def test_start_from_stream_realigns_scrambled_source(spark, workdir):
    """A stream whose columns arrive scrambled/case-shifted indexes
    identically to the canonical order (I10 at the ingest boundary)."""
    import os
    import time

    from pyspark.sql import functions as F

    from aspublic_spark.query import SearchEngine
    from aspublic_spark.streaming.ingest import StreamingIngest
    from aspublic_spark.tables import fixture_transcripts

    src_dir = os.path.join(workdir, "scrambled_src")
    fixture_transcripts(spark).select(
        F.col("ts").alias("TS"), "tool", "text", "role",
        F.col("turn_idx").cast("long").alias("Turn_Idx"), "conv_id",
    ).write.parquet(src_dir)
    scrambled_schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(scrambled_schema).parquet(src_dir)
    ing = StreamingIngest(
        spark,
        index_dir=os.path.join(workdir, "i10_idx"),
        docs_dir=os.path.join(workdir, "i10_docs"),
        index_kwargs={"n_slices": 2, "block_size": 32},
    )
    q = ing.start_from_stream(stream, os.path.join(workdir, "i10_ckpt"))
    q.awaitTermination(120)
    eng = SearchEngine(spark, os.path.join(workdir, "i10_idx"))
    hits = eng.search("sample", k=10).df.collect()
    assert len(hits) == 4  # the 4 'sample' fixture rows


def test_http_jsonl_options_dedupe_repeated_urls():
    from aspublic_spark.sources.http_source import _Options

    o = _Options({"urls": " a , b ,a, c , b "})
    assert o.urls == ["a", "b", "c"]


# ------------------------------------------------------- cli ingest


def test_cli_ingest_pull_from_http_is_idempotent(spark, http, workdir, capsys):
    import json as _json
    import os

    from aspublic_spark import cli
    from aspublic_spark.query import SearchEngine

    routes, base = http
    routes.set(
        "/feed", 200,
        _jsonl([_row("cli1", i, f"ingest quagga {i}") for i in range(4)]),
    )
    argv = [
        "ingest", "--index", os.path.join(workdir, "cli_idx"),
        "--docs", os.path.join(workdir, "cli_docs"),
        "--urls", f"{base}/feed", "--slices", "2", "--block-size", "32",
    ]
    assert cli.main(argv) == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["mode"] == "pull" and out1["rows_ingested"] == 4
    # re-pull the same endpoint: key-sidecar dedup makes it a no-op
    assert cli.main(argv) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows_ingested"] == 0
    eng = SearchEngine(spark, os.path.join(workdir, "cli_idx"))
    assert len(eng.search("quagga", k=10).df.collect()) == 4


def test_cli_ingest_available_now_checkpoint_only_new_files(spark, workdir, capsys):
    import json as _json
    import os

    from pyspark.sql import functions as F

    from aspublic_spark import cli
    from aspublic_spark.query import SearchEngine
    from aspublic_spark.tables import fixture_transcripts

    src = os.path.join(workdir, "cli_src")
    fixture_transcripts(spark).write.mode("append").parquet(src)
    argv = [
        "ingest", "--index", os.path.join(workdir, "cli2_idx"),
        "--docs", os.path.join(workdir, "cli2_docs"),
        "--input-dir", src, "--checkpoint", os.path.join(workdir, "cli2_ckpt"),
        "--slices", "2", "--block-size", "32",
    ]
    assert cli.main(argv) == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["mode"] == "available_now" and out1["received_recent"] == 6
    assert out1["rows_ingested"] == 6
    # new files only on the second pass (checkpointed offsets)
    fixture_transcripts(spark).withColumn(
        "conv_id", F.lit("c2")
    ).write.mode("append").parquet(src)
    assert cli.main(argv) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["received_recent"] == 6  # only the appended files
    assert out2["rows_ingested"] == 6
    eng = SearchEngine(spark, os.path.join(workdir, "cli2_idx"))
    assert len(eng.search("sample", k=20).df.collect()) == 8  # 4 per conv


def test_cli_ingest_follow_http_until_timeout(spark, http, workdir, capsys):
    """--follow stays resident on the http_jsonl stream and drains new
    lines across triggers until --timeout stops it."""
    import json as _json
    import os
    import threading
    import time

    from aspublic_spark import cli
    from aspublic_spark.query import SearchEngine

    routes, base = http
    rows = [_row("f1", i, f"follow okapi {i}") for i in range(3)]
    routes.set("/feed", 200, _jsonl(rows))

    # grow the feed mid-run so at least two triggers carry data
    def grow():
        time.sleep(8)
        routes.set(
            "/feed", 200,
            _jsonl(rows + [_row("f1", 3, "follow okapi late",
                                ts="2026-01-02T03:05:00+00:00")]),
        )

    t = threading.Thread(target=grow, daemon=True)
    t.start()
    rc = cli.main([
        "ingest", "--index", os.path.join(workdir, "f_idx"),
        "--docs", os.path.join(workdir, "f_docs"),
        "--urls", f"{base}/feed", "--checkpoint", os.path.join(workdir, "f_ckpt"),
        "--follow", "--trigger-seconds", "2", "--timeout", "45",
        "--slices", "2", "--block-size", "32",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "follow" and out["rows_ingested"] == 4
    eng = SearchEngine(spark, os.path.join(workdir, "f_idx"))
    assert len(eng.search("okapi", k=10).df.collect()) == 4


# ------------------------------------------------- robustness fixes


def test_unwrap_reblogs_keeps_rows_with_scalar_reblog(spark):
    """Non-Mastodon servers emit reblog:false/"" — scalars must not
    replace a valid status (only an OBJECT reblog unwraps)."""
    rows = [
        {"url": "https://a/1", "content": "<p>keep false</p>", "reblog": False},
        {"url": "https://a/2", "content": "<p>keep empty</p>", "reblog": ""},
        {"url": "https://a/3", "content": "<p>keep zero</p>", "reblog": 0},
    ]
    df = spark.createDataFrame([(json.dumps(o),) for o in rows], "value string")
    out = normalize_status_json(unwrap_reblogs(df)).collect()
    assert sorted(r["url"] for r in out) == ["a/1", "a/2", "a/3"]


def test_probe_endpoint_contains_garbage_domains():
    """A malformed host or a non-HTTP server marks the domain failed
    instead of crashing the registry tick."""
    assert probe_endpoint("http://bad host:abc", timeout=0.5) == (False, None)
    # a raw TCP server speaking non-HTTP bytes -> BadStatusLine
    import socket
    import threading

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def junk():
        conn, _ = srv.accept()
        conn.recv(1024)
        conn.sendall(b"NOT HTTP AT ALL\r\n\r\n")
        conn.close()

    threading.Thread(target=junk, daemon=True).start()
    try:
        assert probe_endpoint(f"http://127.0.0.1:{port}", timeout=2) == (False, None)
    finally:
        srv.close()


def test_stream_poll_failure_makes_no_progress_instead_of_killing(spark, http, workdir):
    """An endpoint that fails a latestOffset poll (after retries) holds
    its offset; the resident query survives and drains the lines once
    the endpoint recovers."""
    import os
    import time

    from aspublic_spark.sources.http_source import _HttpJsonlStreamReader

    routes, base = http
    url = f"{base}/flaky"
    routes.set("/flaky", 200, _jsonl([_row("fk", 0, "flaky alpha")]))
    rdr = _HttpJsonlStreamReader({"urls": url, "timeout": "0.5"})
    assert rdr.latestOffset() == {url: 1}
    # endpoint goes away: poll returns the LAST KNOWN offset, not a raise
    del routes.routes["/flaky"]
    t0 = time.time()
    assert rdr.latestOffset() == {url: 1}
    routes.set("/flaky", 200, _jsonl(
        [_row("fk", 0, "flaky alpha"), _row("fk", 1, "flaky beta")]))
    assert rdr.latestOffset() == {url: 2}
    # strict=true propagates instead
    rdr2 = _HttpJsonlStreamReader({"urls": url, "timeout": "0.5", "strict": "true"})
    del routes.routes["/flaky"]
    with pytest.raises(Exception):
        rdr2.latestOffset()
