"""Round-6 optimization pins.

The optimizations are performance-only; these tests pin the invariants
they rely on:

1. The Arrow-native tokenize fast path emits postings byte-identical to
   the per-row Python tokenizer (including null / empty / whitespace /
   dirty-row edge cases).
2. ``encode_grouped_records_offsets`` (the shared-buffer positions
   encoder) slices exactly like the per-group ``bytes`` encoder.
3. The fused slice-local candidate path returns results bit-identical
   to the staged plan (scores compared exactly, not approximately) for
   every flat query family it covers, on an index with heavy-hitter
   salting and NOT/phrase/NEAR/anchor/OR shapes.
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from aspublic_spark.index import codec
from aspublic_spark.index.build import IndexBuilder, _raw_postings_arrow_factory
from aspublic_spark.query.engine import SearchEngine
from aspublic_spark.query.parser import parse_fts5, parse_websearch
from aspublic_spark.tables import synth_transcripts


def _collect_postings(factory, batch):
    rows = []
    for rb in factory([batch]):
        d = rb.to_pydict()
        for i in range(rb.num_rows):
            rows.append(
                tuple(
                    d[c][i]
                    for c in ["slice", "doc_id", "fld", "dl", "term", "tf", "positions"]
                )
            )
    return sorted(rows)


def _force_python_factory(store_positions, n_fields=1):
    """Build the factory with the Arrow fast path disabled (analyzer
    name unknown to the fast-path gate, tokenizer forced to fts5)."""
    from aspublic_spark.functions import stemmer

    orig = stemmer.get_analyzer
    stemmer.get_analyzer = lambda name: orig("fts5")
    try:
        return _raw_postings_arrow_factory(
            store_positions, n_fields, analyzer="__force_python__"
        )
    finally:
        stemmer.get_analyzer = orig


def test_arrow_tokenize_path_matches_python_path():
    texts = [
        "hash join the table",
        "",
        None,
        "  leading and trailing  ",
        "the  the",
        "UPPER case_mix",
        "café déjà",
        "tab\tsep\nline",
        "   ",
        "a",
        "mixed CLEAN dirty_row here",
        "99 bottles of beer",
    ]
    n = len(texts)
    batch = pa.record_batch(
        [
            pa.array(np.arange(n) % 4, type=pa.int32()),
            pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
            pa.array(texts, type=pa.string()),
        ],
        names=["slice", "doc_id", "f0"],
    )
    for store_positions in (True, False):
        new = _collect_postings(
            _raw_postings_arrow_factory(store_positions, 1, "fts5"), batch
        )
        old = _collect_postings(_force_python_factory(store_positions), batch)
        assert new == old
        assert new  # non-vacuous


def test_grouped_records_offsets_match_bytes_encoder():
    rng = np.random.default_rng(0)
    lens = rng.integers(1, 9, size=200).astype(np.int64)
    vals = np.sort(rng.integers(0, 1 << 20, size=int(lens.sum())))
    buf, off = codec.encode_grouped_records_offsets(vals, lens)
    via_offsets = [buf.tobytes()[off[k] : off[k + 1]] for k in range(off.size - 1)]
    assert via_offsets == codec.encode_grouped_records(vals, lens)


FUSED_QUERIES = [
    ("query spark", {}),
    ("query spark !shuffle", {}),
    ('"the the"', {}),
    ('table !"data query"', {}),
    ("dup OR vector", {"parser": parse_websearch}),
    ('"data query" OR zebra', {"parser": parse_websearch}),
    ("NEAR(data query, 3)", {"parser": parse_fts5}),
    ("^the", {"parser": parse_fts5}),
    ("query spark", {"role": "assistant"}),
    ("data example !query", {"order": "recency"}),
    ("query !query", {}),
]


@pytest.fixture(scope="module")
def fused_idx(spark, workdir):
    idx = os.path.join(workdir, "r6_fused_idx")
    shutil.rmtree(idx, ignore_errors=True)
    IndexBuilder(
        spark, idx, n_slices=4, block_size=32, salt_max_postings=500
    ).build(synth_transcripts(spark, 4000, seed=42))
    return idx


def test_fused_path_bit_identical_to_staged(spark, fused_idx):
    eng = SearchEngine(spark, fused_idx)
    nonzero = 0
    for q, kw in FUSED_QUERIES:
        eng._fused = True
        a = eng.search(q, k=100, **kw).df.collect()
        eng._fused = False
        b = eng.search(q, k=100, **kw).df.collect()
        assert a == b, q  # Row equality includes exact score bits
        nonzero += bool(a)
    assert nonzero >= 8  # the comparisons are non-vacuous


def test_partial_block_build_equals_raw_row_build(spark, workdir):
    """The build's partial-block shuffle format must produce an index
    content-identical to the raw-posting-row path (which compaction
    still uses): same dictionary, same stats, same decoded postings
    (salt/block layout may differ — salt is a shuffle key only)."""
    import aspublic_spark.index.build as B

    df = synth_transcripts(spark, 3000, seed=42)

    def build(idx, use_partial):
        shutil.rmtree(idx, ignore_errors=True)
        b = B.IndexBuilder(
            spark, idx, n_slices=4, block_size=32, salt_max_postings=300
        )
        if use_partial:
            b.build(df)
            return b
        orig = B.IndexBuilder._stage_pack_fused

        def legacy(self, d, gen, n_rows=None, heavy=None):
            self._pack_and_write(
                self._tokenized(d), gen, self._salt_plan(d, n_rows=n_rows)
            )

        B.IndexBuilder._stage_pack_fused = legacy
        try:
            b.build(df)
        finally:
            B.IndexBuilder._stage_pack_fused = orig
        return b

    new_idx = os.path.join(workdir, "r6_partial_new")
    old_idx = os.path.join(workdir, "r6_partial_old")
    bn, bo = build(new_idx, True), build(old_idx, False)
    assert sorted(bn.dictionary_df().collect()) == sorted(bo.dictionary_df().collect())
    assert B.read_stats(new_idx) == B.read_stats(old_idx)
    import pyspark.sql.functions as F

    def postings(idx):
        blocks = spark.read.option("basePath", idx + "/postings").parquet(
            idx + "/postings/gen=0"
        )
        return sorted(SearchEngine(spark, idx).unpack(blocks, with_positions=True).collect())

    assert postings(new_idx) == postings(old_idx)
    # heavy-term salting engaged through the task-id scheme
    mx = spark.read.parquet(new_idx + "/postings/gen=0").agg(F.max("salt")).first()[0]
    assert mx is not None and mx > 0
    for q in ["zebra", "the data", '"the the"']:
        assert (
            SearchEngine(spark, new_idx).search(q, k=50).df.collect()
            == SearchEngine(spark, old_idx).search(q, k=50).df.collect()
        )


def test_fused_path_bit_identical_under_forced_pruning(spark, fused_idx):
    eng = SearchEngine(spark, fused_idx, prune_min_postings=0)
    for q in ["query spark", "query spark !shuffle", "the and"]:
        eng._fused = True
        a = eng.search(q, k=100).df.collect()
        eng._fused = False
        b = eng.search(q, k=100).df.collect()
        assert a == b, q
        assert a


def test_block_ids_dense_and_full_blocks_pass_through(spark, workdir):
    """r6 pack pass-through invariants: (1) map-side cut yields FULL
    blocks (n == block_size) that survive to the stored layout, (2)
    within every (slice, term, fld, salt) group block_ids are dense
    0..k-1 (unique — the theta probe uses them as a window tiebreak),
    (3) no posting is duplicated or lost across the overlapping runs —
    each (doc, term, fld) pair appears exactly once in the whole
    index."""
    import pyspark.sql.functions as F

    idx = os.path.join(workdir, "r6_passthrough_idx")
    shutil.rmtree(idx, ignore_errors=True)
    IndexBuilder(
        spark, idx, n_slices=2, block_size=16, salt_max_postings=200
    ).build(synth_transcripts(spark, 3000, seed=42))
    blocks = spark.read.parquet(idx + "/postings/gen=0")
    assert blocks.filter(F.col("n") == 16).count() > 0  # (1)
    bad = (
        blocks.groupBy("slice", "term", "fld", "salt")
        .agg(
            F.count("*").alias("k"),
            F.countDistinct("block_id").alias("kd"),
            F.max("block_id").alias("mx"),
        )
        .filter((F.col("kd") != F.col("k")) | (F.col("mx") != F.col("k") - 1))
        .count()
    )
    assert bad == 0  # (2)
    eng = SearchEngine(spark, idx)
    unp = eng.unpack(blocks)
    total = unp.count()
    distinct = unp.select("doc_id", "term", "fld").distinct().count()
    assert total == distinct > 0  # (3)
