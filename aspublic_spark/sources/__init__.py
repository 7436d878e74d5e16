"""Source connectors beyond the built-in file/rate/kafka shapes.

- :mod:`http_source` — S2: HTTP JSONL fallback source (PySpark 4
  Python Data Source API; batch + streaming with checkpointed offsets).
- :mod:`discovery` — S3/S4: endpoint health-testing and domain
  auto-discovery feeding a source registry.
"""

from aspublic_spark.sources.http_source import HttpJsonlDataSource, read_http_jsonl
from aspublic_spark.sources.discovery import (
    SourceRegistry,
    discover_domains,
    probe_endpoint,
)

__all__ = [
    "HttpJsonlDataSource",
    "read_http_jsonl",
    "SourceRegistry",
    "discover_domains",
    "probe_endpoint",
]
