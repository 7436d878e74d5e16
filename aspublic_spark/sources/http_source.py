"""S2: HTTP JSONL fallback source (PySpark 4 Python Data Source API).

The reference falls back to an HTTP-stream listener when its websocket
connector fails (collector.py:434-457, wiring :583-600) — an alternate
transport producing the SAME rows as the primary source. The Spark
analog is a custom ``DataSource`` named ``http_jsonl``: batch and
streaming readers over endpoints that serve one JSON object per line
with the transcript shape, so the ingest pipeline attaches unchanged
(``IngestPipeline.start_from_stream`` works on this stream exactly as
on the file/rate/kafka shapes).

Scale/semantics notes:

- One read partition per endpoint URL — N endpoints fetch in parallel
  across executors, like the reference's one-worker-per-domain.
- Streaming offsets are per-URL line counts, checkpointed by Spark;
  replayed micro-batches re-read the same line window, and the ingest
  pipeline's idempotent anti-join dedup makes redelivery exact-once.
  ``latestOffset`` polls each endpoint once per trigger; readers slice
  ``lines[start:end]``. At real scale the slice would ride an HTTP
  Range header instead of a full-body fetch — the sandbox has no such
  server to test against, so the fetch is whole-body here, with the
  offset contract (the part a wire change wouldn't touch) what's
  tested.
- Bad lines are SKIPPED, like the reference's per-status try/except
  import loop; ``strict=true`` raises instead.
- Timestamps accept epoch seconds or ISO-8601 (I8 normalize,
  collector.py:111-123 semantics), normalized to UTC-naive to match
  the session's pinned UTC timezone.
"""

import datetime as dt
import json
import time
import urllib.request

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def _fetch_lines(
    url: str, timeout: float, retries: int = 2, backoff: float = 1.0
) -> list[str]:
    """Fetch with bounded retry+backoff: a resident --follow daemon must
    survive transient endpoint blips (the reference collector retries
    its streams the same way); persistent failure still raises."""
    while True:
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r:
                body = r.read().decode("utf-8", errors="replace")
            return [ln for ln in body.splitlines() if ln.strip()]
        except Exception:
            if retries <= 0:
                raise
            retries -= 1
            time.sleep(backoff)
            backoff *= 2


def _parse_ts(v):
    if v is None:
        return None
    if isinstance(v, (int, float)):
        return dt.datetime.fromtimestamp(float(v), tz=dt.timezone.utc).replace(tzinfo=None)
    t = dt.datetime.fromisoformat(str(v))
    if t.tzinfo is not None:
        t = t.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return t


def _parse_line(ln: str):
    o = json.loads(ln)
    return (
        str(o["conv_id"]),
        int(o["turn_idx"]),
        str(o["role"]),
        str(o["text"]),
        None if o.get("tool") is None else str(o.get("tool")),
        _parse_ts(o.get("ts")),
    )


class _UrlSlice(InputPartition):
    def __init__(self, url: str, start: int, end: int | None):
        self.url = url
        self.start = start
        self.end = end  # None = to EOF (batch read)


class _Options:
    """Shared option parsing for the batch and stream readers."""

    def __init__(self, options: dict):
        urls = options.get("urls", "")
        # order-preserving dedup: a repeated endpoint must not become
        # two partitions double-reading the same lines
        self.urls = list(dict.fromkeys(u.strip() for u in urls.split(",") if u.strip()))
        if not self.urls:
            raise ValueError("http_jsonl requires option 'urls' (comma-separated)")
        self.timeout = float(options.get("timeout", "10"))
        self.strict = str(options.get("strict", "false")).lower() == "true"

    def parse(self, lines):
        for ln in lines:
            try:
                yield _parse_line(ln)
            except (ValueError, KeyError, TypeError, json.JSONDecodeError):
                if self.strict:
                    raise


class _HttpJsonlBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.opts = _Options(options)

    def partitions(self):
        return [_UrlSlice(u, 0, None) for u in self.opts.urls]

    def read(self, partition: _UrlSlice):
        yield from self.opts.parse(_fetch_lines(partition.url, self.opts.timeout))


class _HttpJsonlStreamReader(DataSourceStreamReader):
    """Offsets are {url: lines_consumed}; the planner (driver) polls
    each endpoint once per trigger for its current line count and each
    micro-batch reads exactly the [start, end) window per URL."""

    def __init__(self, options: dict):
        self.opts = _Options(options)
        # last successful poll per URL: an endpoint that fails its poll
        # (even after _fetch_lines' retries) simply makes no progress
        # this trigger instead of killing the resident query — per-URL
        # error containment, like the reference's per-domain workers
        self._last: dict[str, int] = {}

    def initialOffset(self):
        return {u: 0 for u in self.opts.urls}

    def latestOffset(self):
        out = {}
        for u in self.opts.urls:
            try:
                out[u] = len(_fetch_lines(u, self.opts.timeout))
                self._last[u] = out[u]
            except Exception:
                if self.opts.strict:
                    raise
                out[u] = self._last.get(u, 0)
        return out

    def partitions(self, start: dict, end: dict):
        parts = [
            _UrlSlice(u, start.get(u, 0), end[u])
            for u in self.opts.urls
            if end.get(u, 0) > start.get(u, 0)
        ]
        # Spark requires a non-empty plan; an empty slice yields no rows
        return parts or [_UrlSlice(self.opts.urls[0], 0, 0)]

    def read(self, partition: _UrlSlice):
        if partition.start == partition.end:
            return  # empty-plan dummy slice: skip the wasted fetch
        lines = _fetch_lines(partition.url, self.opts.timeout)
        yield from self.opts.parse(lines[partition.start : partition.end])

    def commit(self, end):
        pass  # endpoints are pull-only; nothing to acknowledge


class HttpJsonlDataSource(DataSource):
    @classmethod
    def name(cls):
        return "http_jsonl"

    def schema(self):
        return TRANSCRIPTS_DDL

    def reader(self, schema):
        return _HttpJsonlBatchReader(self.options)

    def streamReader(self, schema):
        return _HttpJsonlStreamReader(self.options)


def read_http_jsonl(spark, urls, stream: bool = False, **options):
    """Register the source (idempotent) and open a batch or streaming
    DataFrame over ``urls`` with the transcript schema."""
    # The STREAMING data-source planner is a standalone Python process
    # the JVM spawns (not forked from the driver, no addPyFile path), so
    # the class must unpickle without this package installed: ship this
    # module by value. It depends only on stdlib + pyspark.sql.datasource.
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(HttpJsonlDataSource)
    opts = {"urls": ",".join(urls), **{k: str(v) for k, v in options.items()}}
    api = spark.readStream if stream else spark.read
    return api.format("http_jsonl").options(**opts).load()
