"""aspublic_spark — a PySpark-native full-text index + BM25 query engine.

A from-scratch reimplementation of the query and data-processing
capabilities of r000t/aspublic (a fediverse full-text search engine that
delegates indexing to sqlite FTS5 / Postgres GIN — see
reference collector.py / viewer.py / common/db_sqlite.py), re-expressed as
distributed Spark dataflow:

- tokenization faithful to FTS5 ``unicode61 remove_diacritics 2``
  (reference db_sqlite.py:27), vectorized via pandas/Arrow UDFs
- explicit inverted-index tables (postings with delta+varint-compressed
  doc gaps, term frequencies, position deltas, per-block max BM25
  weights), built as resumable per-slice Spark jobs
- boolean AND/OR/NOT, phrase, and top-k BM25 (k1=1.2, b=0.75) retrieval
  as DataFrame plans with block-max pruning
- ingest-side operators (dedup, accept/reject policy filters, retention
  prune) and training-data-pipeline operators (MinHash/SimHash near-dup,
  ANN similarity search, language id, quality scoring)

Nothing here is a port: the reference's execution engine is sqlite/
Postgres C code; every operator is re-derived from its observable
semantics and public algorithms (Okapi BM25, block-max WAND, MinHash).
"""

__version__ = "0.1.0"

BM25_K1 = 1.2  # reference FTS5 bm25() defaults, db_sqlite.py:27 (latent capability)
BM25_B = 0.75
