"""S3/S4: endpoint health-testing and domain auto-discovery.

S3 (`probe_endpoint`) is the reference's ``nativeTestDomain``
(collector.py:616-700): probe candidate streaming paths in order,
follow redirects (a redirect to another host restarts the test there),
treat 5xx as try-the-next-path, a 4xx whose body says the access token
is missing as needs-auth-give-up, and retry connection failures with
exponential backoff. Returns ``(ok, endpoint_url)``.

S4 (`discover_domains`) is the ingest-side scan (collector.py:132-136,
:762-771): domains newly seen in ingested URLs, minus already-known and
excluded ones, at most ``max_kickoffs`` per tick. Expressed as a pure
DataFrame projection (distinct + anti-filter + limit) so discovery runs
where the data is; only the <= max_kickoffs winners come to the driver.

``SourceRegistry`` composes the two the way the collector loop does
(collector.py:703-714): each ``tick`` discovers candidate domains from
a batch, health-tests them, and records the reference's status codes
(0 pending, 2 live, -2 failed). Live endpoints feed
:func:`aspublic_spark.sources.read_http_jsonl`.
"""

import http.client
import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame, functions as F

# candidate paths, in probe order (collector.py:624)
DEFAULT_ENDPOINTS = ("/api/v1/streaming/public", "/api/v1/streaming")


def _base_url(domain: str) -> str:
    return domain if "://" in domain else f"https://{domain}"


def probe_endpoint(
    domain: str,
    candidates=DEFAULT_ENDPOINTS,
    bearer_token: str | None = None,
    retries: int = 0,
    backoff: float = 2.0,
    timeout: float = 5.0,
    _depth: int = 0,
):
    """Probe ``domain`` for a live streaming endpoint.

    Returns ``(True, endpoint_url)`` on success — the FINAL url after
    redirects, with a trailing ``/public`` stripped like the reference's
    ``streamingBase`` — or ``(False, None)``.
    """
    if _depth > 3:  # redirect-restart bound (reference recurses unbounded)
        return False, None
    base = _base_url(domain)
    from urllib.parse import urlsplit

    host0 = urlsplit(base).netloc
    while True:
        failure = None
        for path in candidates:
            req = urllib.request.Request(base.rstrip("/") + path)
            if bearer_token:
                req.add_header("Authorization", f"Bearer {bearer_token}")
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    final = urlsplit(resp.geturl())
                    if final.netloc != host0:
                        # hosted elsewhere (streaming.example.com):
                        # restart the whole test against the new host
                        return probe_endpoint(
                            f"{final.scheme}://{final.netloc}",
                            candidates,
                            bearer_token,
                            retries,
                            backoff,
                            timeout,
                            _depth + 1,
                        )
                    streaming_base = (
                        f"{final.scheme}://{final.netloc}"
                        + final.path.removesuffix("/public")
                    )
                    return True, streaming_base
            except urllib.error.HTTPError as e:
                body = e.read().decode("utf-8", errors="replace")
                if e.code < 500 and "missing access token" in body.lower():
                    return False, None  # auth required: give up
                continue  # 5xx / other 4xx: next candidate path
            except (
                urllib.error.URLError,
                TimeoutError,
                OSError,
                # discovered domains are DATA (any garbage can appear in
                # ingested URLs): a malformed host (http.client.InvalidURL
                # via ValueError) or a server speaking non-HTTP
                # (BadStatusLine) must mark the domain failed, not crash
                # the registry tick and strand it at 'pending'
                http.client.HTTPException,
                ValueError,
            ) as e:
                failure = e
                break  # connection-level failure: retry/backoff loop
        if failure is None:
            return False, None  # exhausted candidate paths
        if retries > 0:
            time.sleep(backoff)
            backoff *= 2
            retries -= 1
            continue
        return False, None


def discover_domains(
    df: DataFrame,
    url_col: str = "url",
    known=(),
    excluded_suffixes=(),
    max_kickoffs: int = 10,
) -> DataFrame:
    """Domains newly seen in ``df[url_col]`` — distinct, minus known and
    suffix-excluded, at most ``max_kickoffs`` (smallest-first for
    determinism). The reference's url shape is I3-normalized
    ``netloc/path`` so the domain is everything before the first slash;
    full URLs with a scheme are handled too. Returns a one-column
    DataFrame ``domain`` (drives both the registry and the oracle)."""
    dom = F.substring_index(
        F.regexp_replace(F.col(url_col), r"^[a-z][a-z0-9+.-]*://", ""), "/", 1
    )
    out = df.select(dom.alias("domain")).filter(F.col("domain") != "").distinct()
    known = sorted(set(known))
    if known:
        # the registry's known-set is small (driver state, like the
        # reference's discoveredDomains dict) — a literal NOT IN beats
        # an anti-join; a billion-domain catalog would join instead
        out = out.filter(~F.col("domain").isin(known))
    if excluded_suffixes:
        exc = F.array(*[F.lit(s) for s in sorted(set(excluded_suffixes))])
        out = out.filter(
            ~F.exists(exc, lambda s: F.col("domain").endswith(s))
        )
    return out.orderBy("domain").limit(int(max_kickoffs))


class SourceRegistry:
    """Collector-loop state: domain -> status (0 pending, 2 live,
    -2 failed — collector.py's discoveredDomains codes) plus the live
    endpoint urls, fed by per-batch ticks."""

    def __init__(
        self,
        excluded_suffixes=(),
        candidates=DEFAULT_ENDPOINTS,
        max_kickoffs: int = 10,
        prober=probe_endpoint,
    ):
        self.status: dict[str, int] = {}
        self.endpoints: dict[str, str] = {}
        self.excluded_suffixes = tuple(excluded_suffixes)
        self.candidates = tuple(candidates)
        self.max_kickoffs = max_kickoffs
        self._prober = prober

    def tick(self, df: DataFrame, url_col: str = "url") -> list[str]:
        """One housekeeping tick: discover new domains in the batch,
        health-test each, record the outcome. Returns the domains that
        went live this tick."""
        new = [
            r["domain"]
            for r in discover_domains(
                df,
                url_col,
                known=self.status.keys(),
                excluded_suffixes=self.excluded_suffixes,
                max_kickoffs=self.max_kickoffs,
            ).collect()
        ]
        live = []
        for d in new:
            self.status[d] = 0
            ok, url = self._prober(d, self.candidates)
            if ok:
                self.status[d] = 2
                self.endpoints[d] = url
                live.append(d)
            else:
                self.status[d] = -2
        return live

    @property
    def live_endpoints(self) -> list[str]:
        return [self.endpoints[d] for d in sorted(self.endpoints)]
