"""Inverted-index build: ONE pass tokenize -> shuffle -> packed blocks.

Spark-native analog of the reference's index-maintenance path, where
every ingested row is tokenized and merged into an FTS5 inverted index
by SQL triggers (common/db_sqlite.py:27-41) / a `tsvector` generated
column + GIN index (common/db_postgres.py:29-31). Here the index is a
set of explicit columnar tables, built by DataFrame jobs:

    docs/gen=G/          doc_id, <key cols>, <meta cols>
    postings/gen=G/slice=S/      packed blocks (codec.py)
    dictionary_gens/gen=G/       per-gen (term, fld) -> df/cf/max_tf/min_dl
    dictionary_v/v=N/    merged (term, fld) aggregates (reached through
                         the dictionary_CURRENT.json pointer; a single
                         live generation is pointed at directly)
    stats.json           one row per fld: n_docs, avgdl, total_tokens
    manifest/            one JSON per (stage, gen): status + lineage
                         + metrics (terms/postings/bytes/seconds)

Scale design (the part that must survive 1000 executors / 100 TB):

- the whole build is ONE pass over the corpus: a mapInArrow
  tokenize (linear in tokens; positions leave the Python worker
  already varint-encoded) feeds the pack shuffle DIRECTLY — no
  intermediate raw-postings table is ever written or re-read, and the
  packed blocks are the ONLY stored copy of the postings (~half the
  index storage of a raw+packed layout);
- the pack shuffle keys on (slice, term, fld, salt): heavy-hitter
  terms are split across ``ceil(df/salt_max)`` salts keyed by doc
  hash, so no single reducer ever materializes a full Zipf-head
  posting list (north_rule's explicit skew handling). The salt plan
  needs term df BEFORE the shuffle: incremental generations read it
  from the current global dictionary (exact for the existing corpus,
  a predictor for the batch); a first build estimates it from a 1%
  token sample. The plan is a pure PERFORMANCE hint — any term can
  be salted or not without affecting query results;
- blocks carry (min_doc, max_doc, max_tf, min_dl, sum_tf) so the
  query side can do block-max WAND pruning (score bounds computed at
  QUERY time from max_tf/min_dl under the then-current avgdl — safe
  under cross-generation avgdl drift) and doc-range intersection
  without touching the packed bytes, and so the per-gen dictionary
  aggregates over block METADATA (O(blocks) rows), never re-reading
  postings;
- a generation commits all-or-nothing: its raw manifest is written
  LAST, after docs, packed postings and dictionary are all on disk.
  Executor/task faults are retried by Spark inside the job; a driver
  crash leaves only invisible directories (GC'd by ``repair()``) and
  the generation is rebuilt idempotently from its source batch. Bulk
  loads chunk the corpus into several generations + ``compact()``
  for coarse-grained resume;
- incremental ingest = a new generation directory (the batch analog of
  the FTS5 trigger firing per insert); dictionary/stats quantities are
  all DECOMPOSABLE, so `refresh_global` merges the small per-gen
  dictionaries — per-batch cost independent of corpus history;
- `compact()` merges generations and `prune_index(cutoff)` drops/
  rewrites them by time, both behind crash-safe pending markers; both
  reconstruct shuffle-ready postings from the packed blocks with a
  fully vectorized unpacker (position payloads are re-SLICED per
  posting, never decoded).

Commit protocol (object-store-safe — see fsio.py for the exact two
guarantees it relies on; the reference gets this from sqlite
transactions, db_sqlite.py:28-41):

- a generation is LIVE iff its ``raw`` manifest file exists; data
  directories without that manifest are invisible garbage (GC'd by
  ``repair()``). Readers (engine, refresh_global, compact) enumerate
  generations from the manifest, never by listing data directories;
- every manifest/marker is a single atomically-written file; there is
  NO directory rename anywhere in the lifecycle. Compaction and
  retention-rewrite write their output directly to a fresh generation
  id and flip liveness by committing manifests (Iceberg-style
  new-snapshot, never mutate-in-place);
- the global dictionary is reached through a pointer file
  (``dictionary_CURRENT.json``) naming either a per-gen dictionary
  (single-generation fast path, zero copies) or a merged
  ``dictionary_v/v=N`` version; stats are one atomic ``stats.json``.
"""

from __future__ import annotations

import os
import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aspublic_spark import BM25_B, BM25_K1
from aspublic_spark.index import codec
from aspublic_spark.index.fsio import FileSystem, LocalFS, fs_for

BLOCK_SCHEMA = (
    "slice int, term string, fld int, salt int, block_id int, n int, "
    "min_doc long, max_doc long, "
    "doc_gaps binary, tfs binary, dls binary, positions binary, "
    "sum_tf long, max_tf int, min_dl int"
)

# shuffle-time postings schema: one row per (doc, field, term);
# positions already varint-encoded ([n, first, deltas...] —
# codec.encode_grouped_records) so the pack shuffle moves compressed
# bytes, not array<int>. This schema only exists IN FLIGHT (the
# compaction/prune unpack output); it is never persisted. `fld` is
# the indexed-column ordinal (FTS5 indexes N columns per row,
# `fts5(text, subject, ...)`, reference common/db_sqlite.py:27).
RAW_SCHEMA = (
    "slice int, doc_id long, fld int, dl int, term string, tf int, positions binary"
)
RAW_FORMAT = 4

# shuffle-time PARTIAL-BLOCK schema (the BUILD's in-flight format):
# BLOCK_SCHEMA minus block_id. The tokenize tasks cut their postings at
# block_size boundaries and compute each block's metadata map-side, so
# a FULL row (n == block_size) is already a finished block: the pack
# reducer passes its payload bytes through VERBATIM (guide §8: heavy
# bytes move once, untouched) and only TAIL rows (n < block_size — the
# undersized remainder of each (task, slice, term, fld) group) take
# the decode->merge->re-encode path. The shuffle moves ~#blocks +
# #groups rows instead of one row per POSTING — measurement showed the
# per-posting row conversions dominating the pack stage before this
# format (the pack numpy work itself is ~0.5 s per 10^6 postings).
# Never persisted.
PARTIAL_SCHEMA = (
    "slice int, term string, fld int, salt int, n int, "
    "min_doc long, max_doc long, "
    "doc_gaps binary, tfs binary, dls binary, positions binary, "
    "sum_tf long, max_tf int, min_dl int"
)


# -- snapshot readers (shared by IndexBuilder and SearchEngine) ----------
def live_gens(index_dir: str, fs: FileSystem | None = None) -> list[int]:
    """Generations whose raw manifest is committed — the ONLY definition
    of liveness. Data directories are never trusted as evidence."""
    fs = fs or LocalFS()
    gens = []
    for name in fs.listdir(os.path.join(index_dir, "manifest")):
        if name.startswith("raw_g") and name.endswith(".json"):
            body = name[len("raw_g") : -len(".json")]
            if body.isdigit():
                gens.append(int(body))
    return sorted(gens)


def live_gen_paths(
    index_dir: str, sub: str, fs: FileSystem | None = None
) -> list[str]:
    """Existing data directories of live generations under ``sub``
    (a live gen may not have packed postings yet — filtered out)."""
    fs = fs or LocalFS()
    root = os.path.join(index_dir, sub)
    return [
        os.path.join(root, f"gen={g}")
        for g in live_gens(index_dir, fs)
        if fs.isdir(os.path.join(root, f"gen={g}"))
    ]


def dictionary_location(index_dir: str, fs: FileSystem | None = None) -> str:
    """Resolve the dictionary pointer file to the current parquet dir."""
    fs = fs or LocalFS()
    ptr = fs.read_json(os.path.join(index_dir, "dictionary_CURRENT.json"))
    return os.path.join(index_dir, ptr["path"])


def read_stats(index_dir: str, fs: FileSystem | None = None) -> list[dict]:
    """Per-field corpus stats rows: [{fld, n_docs, avgdl, total_tokens}]."""
    fs = fs or LocalFS()
    return fs.read_json(os.path.join(index_dir, "stats.json"))["by_fld"]


def _raw_postings_arrow_factory(
    store_positions: bool,
    n_fields: int = 1,
    analyzer: str = "fts5",
    partial_salt_threshold: int | None = None,
    block_size: int = 128,
):
    """mapInArrow fn: (slice, doc_id, f0[, f1...]) batches -> raw postings.

    Replaces the former JVM higher-order-function position extraction,
    which rescanned the token array once per distinct term
    (O(distinct_terms x doc_len) — quadratic on long documents). This
    is linear in total token count and vectorized at BATCH level: one
    term factorization over every token of the batch, one lexsort by
    (doc, term_code, position), group boundaries by diff. Positions
    leave here as per-posting varint payloads IN ONE shared buffer
    (an Arrow binary array built from offsets — no Python bytes
    object per posting); the pack stage concatenates the bytes
    verbatim (identical block layout to the previous encoder). Each
    indexed field is tokenized independently (per-field dl and
    positions, exactly like FTS5 columns).

    Tokenization fast path: on rows whose characters are all
    ``[a-z0-9]`` + ASCII whitespace, the FTS5 unicode61 analyzer IS
    ``str.split()`` (each char either maps to itself or is an ASCII
    whitespace separator), so those rows tokenize fully in Arrow C++
    (``ascii_split_whitespace`` + ``dictionary_encode`` — no Python
    string objects at all, measured ~8x over the per-row path). Any
    other row (uppercase, ``_``, punctuation, non-ASCII, or the
    'english' analyzer entirely) takes the exact Python tokenizer;
    both paths emit identical postings for the rows they handle.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from aspublic_spark.functions.stemmer import get_analyzer

    tokenize = get_analyzer(analyzer)
    arrow_fast = analyzer == "fts5"
    _dirty_re = "[^a-z0-9 \t\n\r\x0b\x0c]"
    # per-TASK cumulative (fld, slice, term) posting counts for the
    # local salting rule; reset at the top of emit() (one emit() call
    # per task, single-threaded)
    _salt_cum: dict = {}

    def _emit_partials(slice_p, doc_p, code_p, tf_p, dl_p, buf, off, take_terms, fld):
        """Emit PARTIAL_SCHEMA rows: THIS batch's postings grouped by
        (slice, term), docs sorted ascending, CUT AT block_size
        BOUNDARIES with per-block metadata computed here — a full row
        (n == block_size) is a finished index block the reducer ships
        verbatim; only each group's undersized tail row merges with
        other tasks' tails at the reducer. ``buf``/``off`` hold the
        per-posting position payloads in pre-sort posting order (None
        when positionless).

        Salting is decided LOCALLY (r6): a group salts by map-task id
        once the task's cumulative posting count for it reaches
        ``partial_salt_threshold`` — no global heavy-term probe job.
        The reducer-bound contract is preserved: with threshold L ~=
        salt_max_postings / n_map_tasks, an unsalted (slice, term, fld)
        group receives < L postings from each task, so its reducer
        group stays ~salt_max bounded; a genuinely heavy term crosses L
        in every task and spreads one salt per task. Any assignment is
        result-identical (salt is purely a shuffle-splitting key,
        pinned by the partial-vs-raw content-equality test)."""
        from pyspark import TaskContext

        # rows arrive ALREADY sorted by (slice, code, doc) — _emit_groups
        # sorts postings once in this final order for the partial path,
        # so no second lexsort and no gathers here; the positions buffer
        # is likewise already laid out in final order, so per-block
        # payloads are contiguous zero-copy slices
        sl_s, do_s, co_s2 = slice_p, doc_p, code_p
        tf_s, dl_s = tf_p, dl_p
        np_post = do_s.size
        gstart = np.empty(np_post, dtype=bool)
        gstart[0] = True
        gstart[1:] = (sl_s[1:] != sl_s[:-1]) | (co_s2[1:] != co_s2[:-1])
        group_of_row = np.cumsum(gstart) - 1
        gs = np.flatnonzero(gstart)
        ge = np.append(gs[1:], np_post)
        # per-group salt first (cumulative local rule), then cut blocks
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        gsalts = np.zeros(len(gs), dtype=np.int32)
        if pid and partial_salt_threshold:
            terms_g = take_terms(co_s2[gs]).to_pylist()
            sl_g = sl_s[gs]
            n_g = ge - gs
            thr = partial_salt_threshold
            for i in range(len(gs)):
                key = (fld, int(sl_g[i]), terms_g[i])
                v = _salt_cum.get(key, 0) + int(n_g[i])
                _salt_cum[key] = v
                if v >= thr:
                    gsalts[i] = pid
        in_group = np.arange(np_post, dtype=np.int64) - gs[group_of_row]
        starts = np.flatnonzero(gstart | (in_group % block_size == 0))
        blk = codec.pack_all_blocks(do_s, tf_s, dl_s, starts, as_arrow=True)
        sum_tf = np.add.reduceat(tf_s, starts)
        if store_positions:
            blk_off = np.empty(starts.size + 1, dtype=np.int64)
            blk_off[:-1] = off[starts]
            blk_off[-1] = buf.size
            positions = codec.binary_from_stream(buf, blk_off)
        else:
            positions = codec.binary_from_stream(
                np.empty(0, dtype=np.uint8),
                np.zeros(starts.size + 1, dtype=np.int64),
            )
        bgroup = group_of_row[starts]
        return pa.record_batch(
            [
                pa.array(sl_s[starts], type=pa.int32()),
                take_terms(co_s2[starts]),
                pa.array(np.full(len(starts), fld, dtype=np.int32), type=pa.int32()),
                pa.array(gsalts[bgroup], type=pa.int32()),
                pa.array(blk["n"], type=pa.int32()),
                pa.array(blk["min_doc"], type=pa.int64()),
                pa.array(blk["max_doc"], type=pa.int64()),
                blk["doc_gaps"],
                blk["tfs"],
                blk["dls"],
                positions,
                pa.array(sum_tf.astype(np.int64), type=pa.int64()),
                pa.array(blk["max_tf"].astype(np.int32), type=pa.int32()),
                pa.array(blk["min_dl"].astype(np.int32), type=pa.int32()),
            ],
            names=[
                "slice", "term", "fld", "salt", "n", "min_doc", "max_doc",
                "doc_gaps", "tfs", "dls", "positions",
                "sum_tf", "max_tf", "min_dl",
            ],
        )

    def _emit_groups(slice_sub, doc_sub, lens, codes, take_terms, fld):
        """Shared posting-group assembly: ``lens`` = tokens per doc,
        ``codes`` = term codes in doc-major position order,
        ``take_terms(idx) -> pa.Array`` resolves codes to strings."""
        n = lens.size
        total = int(lens.sum())
        if total == 0:
            return None
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        doc_off = np.empty(n, dtype=np.int64)
        doc_off[0] = 0
        np.cumsum(lens[:-1], out=doc_off[1:])
        pos_in_doc = np.arange(total, dtype=np.int64) - doc_off[doc_idx]
        # np.lexsort is STABLE and the token stream arrives doc-major
        # with positions ascending, so sorting by the GROUP keys alone
        # preserves (doc, pos) order within equal keys — half the sort
        # keys of the naive (…, doc, pos) sort
        if partial_salt_threshold is not None:
            # partial path: sort ONCE in the shuffle-final order
            # (slice, term, doc, pos) so _emit_partials needs no second
            # lexsort and per-block payloads are contiguous slices of
            # the positions buffer; (doc, term) groups stay contiguous
            # with in-order positions either way
            order = np.lexsort((codes, slice_sub[doc_idx]))
        else:
            order = codes.argsort(kind="stable")
        di_s, co_s, po_s = doc_idx[order], codes[order], pos_in_doc[order]
        gstart = np.empty(total, dtype=bool)
        gstart[0] = True
        gstart[1:] = (di_s[1:] != di_s[:-1]) | (co_s[1:] != co_s[:-1])
        starts = np.flatnonzero(gstart)
        g_lens = np.diff(np.append(starts, total))
        g_di = di_s[starts]
        buf = off = None
        if store_positions:
            buf, off = codec.encode_grouped_records_offsets(po_s, g_lens)
        if partial_salt_threshold is not None:
            return _emit_partials(
                slice_sub[g_di],
                doc_sub[g_di],
                co_s[starts],
                g_lens.astype(np.int64),
                lens[g_di],
                buf,
                off,
                take_terms,
                fld,
            )
        if store_positions:
            pos_arr = pa.Array.from_buffers(
                pa.binary(),
                starts.size,
                [
                    None,
                    pa.py_buffer(off.astype(np.int32).tobytes()),
                    pa.py_buffer(buf.tobytes()),
                ],
            )
        else:
            pos_arr = pa.Array.from_buffers(
                pa.binary(),
                starts.size,
                [
                    None,
                    pa.py_buffer(np.zeros(starts.size + 1, dtype=np.int32).tobytes()),
                    pa.py_buffer(b""),
                ],
            )
        return pa.record_batch(
            [
                pa.array(slice_sub[g_di], type=pa.int32()),
                pa.array(doc_sub[g_di], type=pa.int64()),
                pa.array(np.full(starts.size, fld, dtype=np.int32), type=pa.int32()),
                pa.array(lens[g_di].astype(np.int32), type=pa.int32()),
                take_terms(co_s[starts]),
                pa.array(g_lens.astype(np.int32), type=pa.int32()),
                pos_arr,
            ],
            names=["slice", "doc_id", "fld", "dl", "term", "tf", "positions"],
        )

    def one_field_py(slice_np, doc_np, texts, fld):
        import pandas as pd

        n = len(texts)
        toks_per_doc = [tokenize(t) for t in texts]
        lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=n)
        total = int(lens.sum())
        if total == 0:
            return None
        flat = np.empty(total, dtype=object)
        at = 0
        for toks in toks_per_doc:
            if toks:
                flat[at : at + len(toks)] = toks
                at += len(toks)
        codes, uniques = pd.factorize(flat, sort=False)
        uniques = np.asarray(uniques, dtype=object)
        return _emit_groups(
            slice_np,
            doc_np,
            lens,
            codes.astype(np.int64),
            lambda idx: pa.array(uniques[idx], type=pa.string()),
            fld,
        )

    def one_field_arrow(slice_np, doc_np, col, fld):
        """Yields 0-2 record batches: the Arrow-tokenized clean rows and
        the Python-tokenized rest. Posting rows are doc-local, so row
        order across the two sub-batches is irrelevant (the pack
        shuffle re-keys everything)."""
        n = len(col)
        col = pc.fill_null(col, "")
        trimmed = pc.ascii_trim_whitespace(col)
        dirty = pc.match_substring_regex(trimmed, _dirty_re).to_numpy(
            zero_copy_only=False
        )
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        clean_idx = np.flatnonzero(~dirty & ~empty)
        if clean_idx.size:
            sub = (
                trimmed
                if clean_idx.size == n
                else trimmed.take(pa.array(clean_idx))
            )
            tl = pc.ascii_split_whitespace(sub)
            lens = (
                pc.list_value_length(tl)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            de = pc.list_flatten(tl).dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dic = de.dictionary
            out = _emit_groups(
                slice_np[clean_idx],
                doc_np[clean_idx],
                lens,
                codes,
                lambda idx: dic.take(pa.array(idx)),
                fld,
            )
            if out is not None:
                yield out
        dirty_idx = np.flatnonzero(dirty)
        if dirty_idx.size:
            texts = col.take(pa.array(dirty_idx)).to_pylist()
            out = one_field_py(slice_np[dirty_idx], doc_np[dirty_idx], texts, fld)
            if out is not None:
                yield out

    def emit(batches):
        _salt_cum.clear()  # fresh per task (worker processes are reused)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            slice_np = batch.column("slice").to_numpy(zero_copy_only=False).astype(np.int32)
            doc_np = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            for fld in range(n_fields):
                if arrow_fast:
                    yield from one_field_arrow(
                        slice_np, doc_np, batch.column(f"f{fld}"), fld
                    )
                else:
                    out = one_field_py(
                        slice_np, doc_np, batch.column(f"f{fld}").to_pylist(), fld
                    )
                    if out is not None:
                        yield out

    return emit


def _term_count_arrow_factory(n_fields: int, analyzer: str):
    """mapInArrow fn for the salt plan's sample: (f0[, f1...]) batches
    -> (term, fld, cnt) partial occurrence counts, aggregated per batch
    in Arrow C++ (``value_counts``). Same clean/dirty tokenization
    hybrid as :func:`_raw_postings_arrow_factory`: rows of
    ``[a-z0-9]`` + ASCII whitespace split in Arrow, anything else takes
    the exact per-row analyzer — identical token streams, so the df
    estimate matches what the build will actually shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from aspublic_spark.functions.stemmer import get_analyzer

    tokenize = get_analyzer(analyzer)
    arrow_fast = analyzer == "fts5"
    _dirty_re = "[^a-z0-9 \t\n\r\x0b\x0c]"

    def emit(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            for fld in range(n_fields):
                col = pc.fill_null(batch.column(f"f{fld}"), "")
                trimmed = pc.ascii_trim_whitespace(col)
                parts = []
                if arrow_fast:
                    dirty = pc.match_substring_regex(
                        trimmed, _dirty_re
                    ).to_numpy(zero_copy_only=False)
                    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
                    clean_idx = np.flatnonzero(~dirty & ~empty)
                    if clean_idx.size:
                        sub = (
                            trimmed
                            if clean_idx.size == len(col)
                            else trimmed.take(pa.array(clean_idx))
                        )
                        parts.append(pc.list_flatten(pc.ascii_split_whitespace(sub)))
                    dirty_idx = np.flatnonzero(dirty)
                else:
                    dirty_idx = np.arange(len(col))
                if dirty_idx.size:
                    toks = [
                        t
                        for s in col.take(pa.array(dirty_idx)).to_pylist()
                        for t in (tokenize(s) if s else [])
                    ]
                    if toks:
                        parts.append(pa.array(toks, type=pa.string()))
                if not parts:
                    continue
                flat = pa.concat_arrays([p.cast(pa.string()) for p in parts])
                vc = pc.value_counts(flat)
                if len(vc) == 0:
                    continue
                yield pa.record_batch(
                    [
                        vc.field("values"),
                        pa.array(
                            np.full(len(vc), fld, dtype=np.int32), type=pa.int32()
                        ),
                        vc.field("counts"),
                    ],
                    names=["term", "fld", "cnt"],
                )

    return emit


def bm25_weight_col(tf_col, dl_col, avgdl: float):
    """Same weight as a Catalyst column expression (JVM-side, codegen)."""
    tf = tf_col.cast("double")
    dl = dl_col.cast("double")
    return tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))


def _one_chunk(arr):
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # older pyarrow returns ChunkedArray
        if arr.num_chunks > 1:
            # a >2GB binary column that cannot combine into one
            # chunk must fail loudly: silently packing chunk 0
            # only would corrupt the index at exactly the scale
            # this module targets. Remedy: more shuffle
            # partitions / lower salt_max_postings.
            raise RuntimeError(
                "pack partition column exceeds single-chunk Arrow "
                f"limit ({arr.num_chunks} chunks); increase "
                "spark.sql.shuffle.partitions or lower "
                "salt_max_postings"
            )
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=arr.type)
    return arr


def _binary_col_view(arr):
    """(data_u8, starts, lens) view of an Arrow binary column."""
    arr = _one_chunk(arr)
    voff = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    dbuf = arr.buffers()[2]
    data = (
        np.frombuffer(dbuf, dtype=np.uint8)
        if dbuf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return data, voff[:-1], voff[1:] - voff[:-1]


def _gather_payload(data: np.ndarray, starts_b: np.ndarray, lens_b: np.ndarray):
    """Gather variable-length byte slices (in output order) into one
    contiguous stream; element k spans ``out[cum[k]:cum[k+1]]``."""
    totb = int(lens_b.sum())
    cum = np.empty(lens_b.size + 1, dtype=np.int64)
    cum[0] = 0
    np.cumsum(lens_b, out=cum[1:])
    if totb == 0:
        return np.empty(0, dtype=np.uint8), cum
    gather = (
        np.repeat(starts_b, lens_b)
        + np.arange(totb, dtype=np.int64)
        - np.repeat(cum[:-1], lens_b)
    )
    return data[gather], cum


def _assemble_blocks(
    block_size: int,
    store_positions: bool,
    slice_s,
    salt_s,
    fld_s,
    tc_s,
    tstrings,
    doc_s,
    tf_s,
    dl_s,
    pos_bytes_sorted,
    pos_cum,
):
    """Shared block assembly over postings SORTED by (slice, term, fld,
    salt, doc): block boundaries for the whole partition at once,
    codec.pack_all_blocks varint-encodes doc gaps/tfs/dls in one
    vectorized pass each, position payloads are byte-sliced per block
    without ever being decoded. Used by both pack inputs (raw posting
    rows from compaction/prune, partial-block rows from the build)."""
    import pyarrow as pa

    n = doc_s.size
    is_group_start = np.empty(n, dtype=bool)
    is_group_start[0] = True
    is_group_start[1:] = (
        (slice_s[1:] != slice_s[:-1])
        | (tc_s[1:] != tc_s[:-1])
        | (fld_s[1:] != fld_s[:-1])
        | (salt_s[1:] != salt_s[:-1])
    )
    group_id = np.cumsum(is_group_start) - 1
    gs = np.flatnonzero(is_group_start)
    group_start_row = gs[group_id]
    in_group_pos = np.arange(n, dtype=np.int64) - group_start_row
    is_block_start = is_group_start | (in_group_pos % block_size == 0)
    starts = np.flatnonzero(is_block_start)
    ends = np.append(starts[1:], n)

    blk = codec.pack_all_blocks(doc_s, tf_s, dl_s, starts, as_arrow=True)
    if store_positions:
        blk_off = np.empty(starts.size + 1, dtype=np.int64)
        blk_off[:-1] = pos_cum[starts]
        blk_off[-1] = pos_cum[-1]
        blk_positions = codec.binary_from_stream(pos_bytes_sorted, blk_off)
    else:
        blk_positions = codec.binary_from_stream(
            np.empty(0, dtype=np.uint8), np.zeros(starts.size + 1, dtype=np.int64)
        )
    # per-block tf sum: lets the dictionary's cf/total-token
    # aggregates run over block METADATA instead of postings
    sum_tf = np.add.reduceat(tf_s, starts)
    # block_id = index of block within its group
    blk_group = group_id[starts]
    new_group = np.empty(len(starts), dtype=bool)
    new_group[0] = True
    new_group[1:] = blk_group[1:] != blk_group[:-1]
    first_idx = np.flatnonzero(new_group)
    first_blk_of_group = first_idx[np.cumsum(new_group) - 1]
    block_ids = np.arange(len(starts), dtype=np.int64) - first_blk_of_group

    if isinstance(tstrings, list):
        terms_out = pa.array([tstrings[c] for c in tc_s[starts]], type=pa.string())
    else:
        terms_out = tstrings.take(pa.array(tc_s[starts]))
    return pa.record_batch(
        [
            pa.array(slice_s[starts], type=pa.int32()),
            terms_out,
            pa.array(fld_s[starts], type=pa.int32()),
            pa.array(salt_s[starts], type=pa.int32()),
            pa.array(block_ids.astype(np.int32), type=pa.int32()),
            pa.array(blk["n"], type=pa.int32()),
            pa.array(blk["min_doc"], type=pa.int64()),
            pa.array(blk["max_doc"], type=pa.int64()),
            blk["doc_gaps"],
            blk["tfs"],
            blk["dls"],
            blk_positions,
            pa.array(sum_tf.astype(np.int64), type=pa.int64()),
            pa.array(blk["max_tf"].astype(np.int32), type=pa.int32()),
            pa.array(blk["min_dl"].astype(np.int32), type=pa.int32()),
        ],
        names=[
            "slice", "term", "fld", "salt", "block_id", "n", "min_doc", "max_doc",
            "doc_gaps", "tfs", "dls", "positions", "sum_tf", "max_tf", "min_dl",
        ],
    )


def _pack_partition_arrow_factory(block_size: int, store_positions: bool):
    """mapInArrow fn: pack one shuffle partition of RAW posting rows
    into blocks (compaction/prune path — the build ships partial-block
    rows instead, see _pack_partials_arrow_factory).

    The partition holds complete (slice, term, salt) groups (guaranteed
    by the upstream repartition on the same keys). EVERYTHING is
    columnar: the sort is one np.lexsort, and the shared
    _assemble_blocks does boundary/packing work for the whole partition
    at once. Python-side cost is O(blocks) byte-slices, not O(postings).
    """
    import pyarrow as pa

    def pack(batches):
        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list).combine_chunks()
        n = tbl.num_rows
        if n == 0:
            return
        slice_np = tbl.column("slice").to_numpy(zero_copy_only=False).astype(np.int32)
        salt_np = tbl.column("salt").to_numpy(zero_copy_only=False).astype(np.int32)
        fld_np = tbl.column("fld").to_numpy(zero_copy_only=False).astype(np.int32)
        doc_np = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tf_np = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        dl_np = tbl.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)
        tdict = _one_chunk(tbl.column("term").dictionary_encode())
        tcodes = tdict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tstrings = tdict.dictionary.to_pylist()

        order = np.lexsort((doc_np, salt_np, fld_np, tcodes, slice_np))
        slice_s, salt_s, doc_s = slice_np[order], salt_np[order], doc_np[order]
        tf_s, dl_s, tc_s, fld_s = tf_np[order], dl_np[order], tcodes[order], fld_np[order]

        # positions arrive as per-posting varint payloads (RAW_SCHEMA);
        # a block's payload is the byte-concatenation of its rows' bytes
        # in sorted order — gather the bytes, never decode/re-encode
        pos_bytes_sorted = pos_cum = None
        if store_positions:
            vdata, pstarts, plens = _binary_col_view(tbl.column("positions"))
            pos_bytes_sorted, pos_cum = _gather_payload(
                vdata, pstarts[order], plens[order]
            )
        yield _assemble_blocks(
            block_size, store_positions, slice_s, salt_s, fld_s, tc_s,
            tstrings, doc_s, tf_s, dl_s, pos_bytes_sorted, pos_cum,
        )

    return pack


def _pack_partials_arrow_factory(block_size: int, store_positions: bool):
    """mapInArrow fn: pack one shuffle partition of PARTIAL-BLOCK rows
    (the build's in-flight format) into final blocks.

    FULL rows (n == block_size) are finished blocks cut map-side: their
    payload bytes pass through VERBATIM — no varint decode, no posting
    sort, no re-encode (guide §8: the heavy bytes cross the shuffle
    once and are never touched again). Only TAIL rows (n < block_size)
    take the merge path: the same one-varint-pass-per-column decode as
    the query-side unpack, a posting lexsort, and re-assembly into
    blocks; positions are never decoded even there — per-posting byte
    boundaries come from a varint-end scan (posting k spans tf_k + 1
    varints) and the compressed bytes are re-sliced verbatim, so the
    merged payload is bit-identical to a raw-row pack of the same
    postings. block_id is assigned over the combined output per
    (slice, term, fld, salt) group in (min_doc, max_doc) order —
    deterministic, since a (doc, term, fld) posting exists exactly
    once globally, so blocks of one group can't share min_doc."""
    import pyarrow as pa

    OUT_COLS = [
        "slice", "term", "fld", "salt", "n", "min_doc", "max_doc",
        "doc_gaps", "tfs", "dls", "positions", "sum_tf", "max_tf", "min_dl",
    ]

    def _merge_tails(tbl):
        """Today's decode->sort->assemble path, over the tail subset."""
        nb = tbl.num_rows
        n_np = tbl.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n_np.sum())
        if total == 0:
            return None
        row_starts = np.zeros(nb, dtype=np.int64)
        np.cumsum(n_np[:-1], out=row_starts[1:])
        row_of_post = np.repeat(np.arange(nb, dtype=np.int64), n_np)

        def _concat(name):
            data, st, ln = _binary_col_view(tbl.column(name))
            return data[st[0] : st[-1] + ln[-1]] if nb else data

        # doc ids: zigzag firsts per partial row, grouped cumsum
        enc = codec.decode_varints(_concat("doc_gaps").tobytes())
        firsts = codec._unzigzag(enc[row_starts]).view(np.uint64)
        enc[row_starts] = firsts
        csum = np.cumsum(enc, dtype=np.uint64)
        base = csum[row_starts] - enc[row_starts]
        doc_np = (csum - np.repeat(base, n_np)).view(np.int64)
        tf_np = codec.decode_varints(_concat("tfs").tobytes()).astype(np.int64)
        dl_np = codec.decode_varints(_concat("dls").tobytes()).astype(np.int64)

        slice_r = tbl.column("slice").to_numpy(zero_copy_only=False).astype(np.int32)
        salt_r = tbl.column("salt").to_numpy(zero_copy_only=False).astype(np.int32)
        fld_r = tbl.column("fld").to_numpy(zero_copy_only=False).astype(np.int32)
        tdict = _one_chunk(tbl.column("term").dictionary_encode())
        tcodes_r = tdict.indices.to_numpy(zero_copy_only=False).astype(np.int64)

        slice_np = slice_r[row_of_post]
        salt_np = salt_r[row_of_post]
        fld_np = fld_r[row_of_post]
        tcodes = tcodes_r[row_of_post]

        order = np.lexsort((doc_np, salt_np, fld_np, tcodes, slice_np))
        slice_s, salt_s, doc_s = slice_np[order], salt_np[order], doc_np[order]
        tf_s, dl_s, tc_s, fld_s = tf_np[order], dl_np[order], tcodes[order], fld_np[order]

        pos_bytes_sorted = pos_cum = None
        if store_positions:
            pbytes = _concat("positions")
            # per-posting byte boundaries: posting k's record is
            # [n=tf_k, first, deltas...] = tf_k + 1 varint elements
            is_end = (pbytes & 0x80) == 0
            elem_ends = np.flatnonzero(is_end)
            elem_starts = np.empty_like(elem_ends)
            if elem_ends.size:
                elem_starts[0] = 0
                elem_starts[1:] = elem_ends[:-1] + 1
            rec_first = np.zeros(total, dtype=np.int64)
            np.cumsum(tf_np[:-1] + 1, out=rec_first[1:])
            rec_last = rec_first + tf_np
            byte_s = elem_starts[rec_first]
            byte_l = elem_ends[rec_last] + 1 - byte_s
            pos_bytes_sorted, pos_cum = _gather_payload(
                pbytes, byte_s[order], byte_l[order]
            )
        merged = _assemble_blocks(
            block_size, store_positions, slice_s, salt_s, fld_s, tc_s,
            tdict.dictionary, doc_s, tf_s, dl_s, pos_bytes_sorted, pos_cum,
        )
        return pa.Table.from_batches([merged]).select(OUT_COLS)

    def pack(batches):
        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list).combine_chunks()
        nb = tbl.num_rows
        if nb == 0:
            return
        n_all = tbl.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        full_mask = n_all == block_size
        parts = []
        if not full_mask.all():
            tails = (
                tbl
                if not full_mask.any()
                else tbl.filter(pa.array(~full_mask)).combine_chunks()
            )
            merged = _merge_tails(tails)
            if merged is not None:
                parts.append(merged)
        if full_mask.any():
            full = (
                tbl
                if full_mask.all()
                else tbl.filter(pa.array(full_mask)).combine_chunks()
            )
            parts.append(full.select(OUT_COLS))
        if not parts:
            return
        out = (
            parts[0]
            if len(parts) == 1
            else pa.concat_tables(parts).combine_chunks()
        )
        # block_id per (slice, term, fld, salt) group, (min_doc, max_doc)
        # order — O(blocks) metadata sort, payloads untouched
        sl = out.column("slice").to_numpy(zero_copy_only=False).astype(np.int32)
        fl = out.column("fld").to_numpy(zero_copy_only=False).astype(np.int32)
        sa = out.column("salt").to_numpy(zero_copy_only=False).astype(np.int32)
        mind = out.column("min_doc").to_numpy(zero_copy_only=False).astype(np.int64)
        maxd = out.column("max_doc").to_numpy(zero_copy_only=False).astype(np.int64)
        td = _one_chunk(out.column("term").dictionary_encode())
        tc = td.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((maxd, mind, sa, fl, tc, sl))
        sl_o, fl_o, sa_o, tc_o = sl[order], fl[order], sa[order], tc[order]
        nblk = order.size
        new_grp = np.empty(nblk, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (
            (sl_o[1:] != sl_o[:-1])
            | (tc_o[1:] != tc_o[:-1])
            | (fl_o[1:] != fl_o[:-1])
            | (sa_o[1:] != sa_o[:-1])
        )
        grp_first = np.flatnonzero(new_grp)
        block_ids = (
            np.arange(nblk, dtype=np.int64)
            - grp_first[np.cumsum(new_grp) - 1]
        )
        out = out.take(pa.array(order)).add_column(
            4, "block_id", pa.array(block_ids.astype(np.int32), type=pa.int32())
        )
        for b in out.to_batches():
            yield b

    return pack


def _unpack_blocks_to_raw_factory(store_positions: bool, with_gen: bool = True):
    """mapInArrow fn: packed blocks -> shuffle-ready raw postings rows.

    The inverse of the pack stage, used by compact()/prune_index() to
    reconstruct postings for re-packing WITHOUT a stored raw table.
    Fully vectorized per batch: every block's doc_gaps/tfs/dls byte
    payloads concatenate into one stream per column and decode in ONE
    varint pass (varints are self-delimiting), per-block absolute doc
    ids come from a grouped cumsum, and the positions payload is never
    decoded at all — per-posting boundaries are found by a single
    varint-end scan (posting k's record spans tf_k + 1 varints) and the
    compressed bytes are re-sliced verbatim, so a pack->unpack->pack
    round trip is bit-identical.
    """
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            nb = batch.num_rows
            if nb == 0:
                continue
            n_np = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            total = int(n_np.sum())
            if total == 0:
                continue
            starts = np.zeros(nb, dtype=np.int64)
            np.cumsum(n_np[:-1], out=starts[1:])
            blk_of_post = np.repeat(np.arange(nb, dtype=np.int64), n_np)

            def _concat_bytes(name):
                col = batch.column(name)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                voff = np.frombuffer(col.buffers()[1], dtype=np.int32)[
                    col.offset : col.offset + len(col) + 1
                ].astype(np.int64)
                dbuf = col.buffers()[2]
                data = (
                    np.frombuffer(dbuf, dtype=np.uint8)
                    if dbuf is not None
                    else np.empty(0, dtype=np.uint8)
                )
                # per-row payloads are adjacent in arrow binary storage
                return data[voff[0] : voff[-1]], voff - voff[0]

            # --- doc ids: one varint pass, zigzag firsts, grouped cumsum
            gbytes, _ = _concat_bytes("doc_gaps")
            enc = codec.decode_varints(gbytes.tobytes())
            firsts = codec._unzigzag(enc[starts]).view(np.uint64)
            enc[starts] = firsts
            csum = np.cumsum(enc, dtype=np.uint64)
            base = csum[starts] - enc[starts]
            doc_ids = (csum - np.repeat(base, n_np)).view(np.int64)

            tbytes, _ = _concat_bytes("tfs")
            tfs = codec.decode_varints(tbytes.tobytes()).astype(np.int64)
            dbytes_, _ = _concat_bytes("dls")
            dls = codec.decode_varints(dbytes_.tobytes()).astype(np.int64)

            term_col = batch.column("term")
            if isinstance(term_col, pa.ChunkedArray):
                term_col = term_col.combine_chunks()
            terms_out = term_col.take(pa.array(blk_of_post))
            slice_np = batch.column("slice").to_numpy(zero_copy_only=False).astype(np.int32)
            fld_np = batch.column("fld").to_numpy(zero_copy_only=False).astype(np.int32)
            cols = [
                pa.array(slice_np[blk_of_post], type=pa.int32()),
                pa.array(doc_ids, type=pa.int64()),
                pa.array(fld_np[blk_of_post], type=pa.int32()),
                pa.array(dls.astype(np.int32), type=pa.int32()),
                terms_out,
                pa.array(tfs.astype(np.int32), type=pa.int32()),
            ]
            names = ["slice", "doc_id", "fld", "dl", "term", "tf"]

            if store_positions:
                pbytes, _ = _concat_bytes("positions")
                is_end = (pbytes & 0x80) == 0
                elem_ends = np.flatnonzero(is_end)
                elem_starts = np.empty_like(elem_ends)
                if elem_ends.size:
                    elem_starts[0] = 0
                    elem_starts[1:] = elem_ends[:-1] + 1
                # posting k's record is [n=tf_k, first, deltas...]:
                # tf_k + 1 varint elements
                rec_first = np.zeros(total, dtype=np.int64)
                np.cumsum(tfs[:-1] + 1, out=rec_first[1:])
                rec_last = rec_first + tfs
                byte_s = elem_starts[rec_first]
                byte_e = elem_ends[rec_last] + 1
                pview = pbytes.tobytes()
                payloads = [pview[s:e] for s, e in zip(byte_s, byte_e)]
                cols.append(pa.array(payloads, type=pa.binary()))
            else:
                cols.append(
                    pa.array(np.full(total, b"", dtype=object), type=pa.binary())
                )
            names.append("positions")

            if with_gen:
                gen_np = batch.column("gen").to_numpy(zero_copy_only=False).astype(np.int32)
                cols.append(pa.array(gen_np[blk_of_post], type=pa.int32()))
                names.append("gen")
            yield pa.record_batch(cols, names=names)

    return run


class IndexBuilder:
    """Builds and incrementally extends a segmented inverted index."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        key_cols: list[str] = ("conv_id", "turn_idx"),
        text_col: str = "text",
        meta_cols: list[str] = ("role", "tool", "ts"),
        block_size: int = 128,
        n_slices: int | None = None,
        store_positions: bool = True,
        salt_max_postings: int = 100_000,
        text_cols: list[str] | None = None,
        analyzer: str = "fts5",
        fs: FileSystem | None = None,
    ):
        """``text_cols`` indexes multiple columns as FTS5 fields (the
        reference indexes BOTH text and subject, db_sqlite.py:27-41);
        field ordinal = list position. ``text_col`` remains the
        single-field shorthand. ``analyzer``: 'fts5' (unicode61
        semantics, the rank-identity backend) or 'english' (the
        Postgres to_tsvector('english') variant: stopwords dropped,
        Porter-stemmed — db_postgres.py:29-31).

        ``n_slices=None`` (default) auto-sizes from the FIRST build's
        corpus volume (~1M docs per slice, floor 8, cap 4096; bounded
        LIMIT probe so small inputs never pay a count pass). Slices are
        the doc-hash partitions of the index and the ONLY co-location
        key a phrase match can shuffle packed blocks by (see engine.py
        _phrase_match_factory), so they cap phrase parallelism AND set
        the per-task decoded-positions memory unit (~24B per
        phrase-term occurrence in a slice; 1M docs x ~20 tokens with a
        20% Zipf head ~= 100MB decoded per task). Sizing is by VOLUME,
        not session width: a measured sweep at sf0.1 (PLANS.md) shows
        q_phrase flat from 4->8 slices and degrading at 16/32 — when
        per-slice volume is small, extra slices only add task/file
        overhead, so parallelism-based sizing would pessimize exactly
        the corpora it fits in. Explicit n_slices always wins (an
        operator sizing for a known cluster); a stored index's layout
        always wins over both."""
        self.spark = spark
        self.index_dir = index_dir
        self.key_cols = list(key_cols)
        self.text_cols = list(text_cols) if text_cols else [text_col]
        self.text_col = self.text_cols[0]
        self.meta_cols = list(meta_cols)
        self.block_size = block_size
        self.n_slices = n_slices  # None -> resolved at first build()
        self.store_positions = store_positions
        self.salt_max_postings = salt_max_postings
        self.analyzer = analyzer
        self.fs = fs or fs_for(index_dir, spark)
        # The commit protocol reads Spark's per-directory _SUCCESS
        # markers as write-completeness evidence (compaction/prune
        # roll-forward validation, repair()'s damage check). Cluster
        # tuning guides sometimes disable them for S3; the protocol is
        # NOT safe without them, so pin the setting for this session.
        try:
            spark.sparkContext._jsc.hadoopConfiguration().set(
                "mapreduce.fileoutputcommitter.marksuccessfuljobs", "true"
            )
        except Exception:
            pass  # non-JVM test doubles
        # reopening an existing index: the stored layout wins — building
        # a new generation with different slicing/fields/block size
        # would silently corrupt the segment set
        meta_path = os.path.join(index_dir, "index_meta.json")
        if self.fs.exists(meta_path):
            m = self.fs.read_json(meta_path)
            self.key_cols = m["key_cols"]
            self.meta_cols = m["meta_cols"]
            self.text_cols = m.get("text_cols", [m.get("text_col", "text")])
            self.text_col = self.text_cols[0]
            self.block_size = m.get("block_size", block_size)
            self.n_slices = m.get("n_slices", n_slices)
            self.store_positions = m.get("store_positions", store_positions)
            self.salt_max_postings = m.get("salt_max_postings", salt_max_postings)
            self.analyzer = m.get("analyzer", "fts5")
        self.fs.makedirs(os.path.join(index_dir, "manifest"))

    # -- paths -------------------------------------------------------
    def _p(self, *parts) -> str:
        return os.path.join(self.index_dir, *parts)

    def _manifest_path(self, stage: str, gen: int, slice_id: int | None = None) -> str:
        name = f"{stage}_g{gen}" + (f"_s{slice_id}" if slice_id is not None else "")
        return self._p("manifest", name + ".json")

    def _manifest_done(self, stage: str, gen: int, slice_id: int | None = None) -> bool:
        return self.fs.exists(self._manifest_path(stage, gen, slice_id))

    def _commit(self, stage: str, gen: int, slice_id: int | None, metrics: dict):
        rec = {
            "stage": stage,
            "gen": gen,
            "slice": slice_id,
            "status": "done",
            "app_id": self.spark.sparkContext.applicationId,
            **metrics,
        }
        # single-file atomic write: the ONLY commit primitive (fsio.py)
        self.fs.write_json_atomic(self._manifest_path(stage, gen, slice_id), rec)

    def manifest(self) -> list[dict]:
        out = []
        mdir = self._p("manifest")
        for name in self.fs.listdir(mdir):
            # *_pending.json are crash-recovery markers, not stage records
            if name.endswith(".json") and not name.endswith("_pending.json") and not name.endswith(".tmp"):
                out.append(self.fs.read_json(os.path.join(mdir, name)))
        return out

    def _live_gens(self) -> list[int]:
        return live_gens(self.index_dir, self.fs)

    def _clear_gen_manifests(self, gen: int, stages=("raw", "gendict", "pack")):
        """Remove one generation's stage manifests (used when dropping a
        generation or before re-writing its raw output, so stale derived
        state can never be mistaken for committed)."""
        mdir = self._p("manifest")
        for name in self.fs.listdir(mdir):
            for st in stages:
                if name == f"{st}_g{gen}.json" or name.startswith(f"{st}_g{gen}_s"):
                    self.fs.delete(os.path.join(mdir, name))

    def _next_gen_id(self) -> int:
        """A generation id not colliding with any live gen OR any
        leftover data directory (an orphan from a crashed compaction or
        prune that repair() has not collected yet)."""
        mx = -1
        for g in self._live_gens():
            mx = max(mx, g)
        for sub in ("docs", "postings_raw", "postings", "dictionary_gens"):
            for name in self.fs.listdir(self._p(sub)):
                if name.startswith("gen=") and name[4:].isdigit():
                    mx = max(mx, int(name[4:]))
        return mx + 1

    # -- doc identity ------------------------------------------------
    def doc_id_col(self):
        """Deterministic 64-bit doc id from the key columns.

        Single numeric key (e.g. documents.doc_id) passes through so
        external ids stay meaningful; composite keys hash via xxhash64
        (stateless -> identical under any partitioning)."""
        if len(self.key_cols) == 1:
            return F.col(self.key_cols[0]).cast("long")
        return F.xxhash64(*[F.col(c) for c in self.key_cols])

    # -- stages ------------------------------------------------------
    def build(self, df: DataFrame, gen: int = 0, resume: bool = True) -> dict:
        """Build one generation in ONE pass over ``df``.

        tokenize -> salt -> shuffle -> pack, writing docs + packed
        postings + per-gen dictionary, then committing the generation's
        raw manifest LAST (the all-or-nothing liveness flip). If the
        generation is already live and ``resume`` is set, only the
        global refresh runs (idempotent replay after a crash between
        liveness commit and refresh)."""
        t0 = time.time()
        if resume and self._manifest_done("raw", gen):
            # generation fully committed — only the global view may be
            # stale (crash between liveness flip and refresh)
            self._stage_global(resume=resume)
            return {"seconds": time.time() - t0, "manifest": self.manifest()}
        # (re)building this generation invalidates any sub-stage state a
        # crashed earlier attempt left behind — stale derived markers
        # must never survive over data about to be replaced
        self._clear_gen_manifests(gen)
        # Two independent heads: the n_slices LIMIT probe (first build
        # only, bounded) and the docs write; salting is decided inside
        # the pack job's map tasks (r6 local rule — no salt-plan job at
        # all), so the fused tokenize->pack job starts immediately. The
        # docs write is submitted from a driver thread first and the
        # pack job runs under it; Spark schedules concurrent jobs FIFO,
        # so their tasks back-fill cores (guide: overlap independent
        # jobs). Commit order is unchanged: the raw manifest still
        # flips only after every job's output (and the gen dictionary)
        # is fully on disk.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            if self.n_slices is None:
                self.n_slices = self._resolve_auto_slices(df)
            meta_path = self._p("index_meta.json")
            if self.fs.exists(meta_path):
                existing = self.fs.read_json(meta_path)
                if existing.get("raw_format", 1) != RAW_FORMAT:
                    raise ValueError(
                        f"index at {self.index_dir} uses raw postings format "
                        f"{existing.get('raw_format', 1)}, this build writes "
                        f"{RAW_FORMAT}; rebuild into a fresh directory"
                    )
            else:
                self.fs.write_json_atomic(
                    meta_path,
                    {
                        "raw_format": RAW_FORMAT,
                        "analyzer": self.analyzer,
                        "key_cols": self.key_cols,
                        "meta_cols": self.meta_cols,
                        "text_col": self.text_col,
                        "text_cols": self.text_cols,
                        "block_size": self.block_size,
                        "n_slices": self.n_slices,
                        "store_positions": self.store_positions,
                        "salt_max_postings": self.salt_max_postings,
                    },
                )
            docs_fut = pool.submit(self._stage_docs, df, gen)
            try:
                self._stage_pack_fused(df, gen)
            finally:
                n_docs = docs_fut.result()
        self._stage_gen_dict(gen, n_docs=n_docs)
        # liveness flip: the generation becomes visible only now, with
        # every piece of its state already on disk
        self._commit("raw", gen, None, {"n_docs": n_docs})
        self._stage_global(resume=resume)
        return {"seconds": time.time() - t0, "manifest": self.manifest()}

    def add_documents(self, df: DataFrame, gen: int, resume: bool = True) -> dict:
        """Incremental ingest: index a new batch as generation ``gen``.

        Batch analog of the reference's trigger-per-insert index
        maintenance (db_sqlite.py:28-41). Caller ensures doc keys are
        new (pair with operators.filters.anti_join_existing for the
        idempotent ON CONFLICT DO NOTHING upsert, db_sqlite.py:55-59).
        """
        return self.build(df, gen=gen, resume=resume)

    DOCS_PER_SLICE = 1_000_000
    MIN_SLICES = 8
    MAX_SLICES = 4096

    def _resolve_auto_slices(self, df: DataFrame) -> int:
        """Size n_slices from the first build's corpus volume.

        A LocalLimit probe answers "more than MIN_SLICES full slices of
        docs?" with bounded cost regardless of input size (same trick
        as the salt plan's heavy-term probe); only genuinely large
        first builds pay the column-pruned count() that sizes them."""
        cap = self.MIN_SLICES * self.DOCS_PER_SLICE
        probe = df.select(F.lit(1).alias("one")).limit(cap + 1).count()
        if probe <= cap:
            return self.MIN_SLICES
        n_docs = df.count()
        return int(
            min(self.MAX_SLICES, -(-n_docs // self.DOCS_PER_SLICE))
        )

    def _slice_col(self):
        if self.n_slices is None:
            raise RuntimeError(
                "n_slices unresolved — auto sizing happens at the first "
                "build(); open an existing index or pass n_slices"
            )
        return F.pmod(
            F.xxhash64(F.lit(7), F.col("doc_id")), F.lit(self.n_slices)
        ).cast("int")

    def _stage_docs(self, df: DataFrame, gen: int) -> int:
        """Write the docs table for one generation; returns its row
        count (observed on the write itself — no extra job). No
        tokenization here: doc lengths live inline in the postings and
        corpus stats derive from packed block metadata."""
        from pyspark.sql import Observation

        doc_id = self.doc_id_col()
        docs = df.select(
            doc_id.alias("doc_id"),
            *[F.col(c) for c in self.key_cols if c != "doc_id"],
            *[F.col(c) for c in self.meta_cols],
        ).withColumn("slice", self._slice_col())
        obs = Observation(f"docs_g{gen}_{time.time_ns()}")
        # per-generation subdir + overwrite => a crashed-and-retried
        # build is idempotent (append would duplicate the docs rows and
        # silently inflate N/avgdl)
        docs.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(self._p("docs", f"gen={gen}"))
        return int(obs.get["n"] or 0)

    def _tokenized(
        self, df: DataFrame, partial_salt_threshold: int | None = None
    ) -> DataFrame:
        """Input scan -> shuffle-ready postings (IN FLIGHT only).

        ONE mapInArrow over (slice, doc_id, text): tokenize, group
        term->positions linearly (batch-level factorize + lexsort, no
        per-doc Python beyond the tokenizer), emit positions already
        varint-encoded. No action of its own — this plan feeds the
        pack shuffle directly. With ``partial_salt_threshold`` the
        output is PARTIAL_SCHEMA rows — one per (task, slice, term,
        fld) group, salted locally once the task's cumulative count
        for the group crosses the threshold — instead of one row per
        posting, collapsing the pack exchange and both mapInArrow
        boundary crossings to O(groups) rows."""
        doc_id = self.doc_id_col()
        src = (
            df.select(
                doc_id.alias("doc_id"),
                *[F.col(c).alias(f"f{i}") for i, c in enumerate(self.text_cols)],
            )
            .withColumn("slice", self._slice_col())
            .select("slice", "doc_id", *[f"f{i}" for i in range(len(self.text_cols))])
        )
        if partial_salt_threshold is not None:
            return src.mapInArrow(
                _raw_postings_arrow_factory(
                    self.store_positions, len(self.text_cols), self.analyzer,
                    partial_salt_threshold=partial_salt_threshold,
                    block_size=self.block_size,
                ),
                PARTIAL_SCHEMA,
            )
        return src.mapInArrow(
            _raw_postings_arrow_factory(
                self.store_positions, len(self.text_cols), self.analyzer
            ),
            RAW_SCHEMA,
        )

    def _salt_plan(self, df: DataFrame | None, n_rows: int | None = None) -> DataFrame:
        """Heavy-hitter salting plan: a tiny (term, fld, n_salts) table,
        broadcast-joined pre-shuffle so no reducer materializes a full
        Zipf-head posting list. Used by the RAW-ROW pack path only
        (compaction / retention rewrites, where live generations make
        the dictionary branch exact and job-cheap); the fused BUILD
        decides salting inside its map tasks since r6 (local cumulative
        threshold, _emit_partials) and never calls this. The sample
        branch (first build, no dictionary) estimates df from a ~1%
        token sample (occurrence counts upper-bound doc counts, so
        estimation errs toward MORE salts). The plan is a performance
        hint only: any term may be salted or not without affecting
        packed-block or query correctness."""
        if self._live_gens():
            return (
                self.dictionary_df()
                .filter(F.col("df") > self.salt_max_postings)
                .select(
                    "term",
                    "fld",
                    F.ceil(F.col("df") / self.salt_max_postings)
                    .cast("int")
                    .alias("n_salts"),
                )
            )
        # df(term, fld) is bounded by the input row count: when the
        # caller already knows the count (``n_rows``, the docs stage's
        # observed number — free), an input smaller than salt_max
        # cannot contain a heavy term and the sample is skipped with
        # NO job at all. Without a known count the sample itself IS
        # the probe: a small input's 1% sample scan is as cheap as the
        # former bounded LIMIT probe, and a large input saves one
        # whole driver round-trip (probe job + sample job -> one
        # sample job). For a huge FIRST bulk build the sample costs
        # one extra text-column read — chunk bulk loads into
        # generations + compact() to avoid it (every generation after
        # the first plans from the dictionary).
        if n_rows is not None and n_rows <= self.salt_max_postings:
            return self.spark.createDataFrame(
                [], "term string, fld int, n_salts int"
            )
        frac = 0.01
        # token counts come out of the sample PRE-AGGREGATED per Arrow
        # batch (value_counts in Arrow C++, same clean/dirty hybrid as
        # the build tokenizer) — the groupBy exchange then carries
        # O(distinct terms per batch) rows, never one row per token,
        # and no per-row Python tokenizer runs on the clean rows
        sampled = df.sample(fraction=frac, seed=42).select(
            *[
                F.col(c).alias(f"f{i}")
                for i, c in enumerate(self.text_cols)
            ]
        ).mapInArrow(
            _term_count_arrow_factory(len(self.text_cols), self.analyzer),
            "term string, fld int, cnt long",
        )
        est = (
            sampled.groupBy("term", "fld")
            .agg((F.sum("cnt") / F.lit(frac)).alias("est_df"))
            .filter(F.col("est_df") > self.salt_max_postings / 2)
            .select(
                "term",
                "fld",
                F.greatest(
                    F.lit(1),
                    F.ceil(F.col("est_df") / self.salt_max_postings).cast("int"),
                ).alias("n_salts"),
            )
        )
        return est

    def _stage_gen_dict(self, gen: int, n_docs: int | None = None):
        """Per-generation dictionary: aggregate THIS generation's packed
        block METADATA (term, fld, n, sum_tf, max_tf, min_dl — an
        O(blocks) scan that never touches the packed byte payloads)
        into (term, fld) -> df/cf/max_tf/min_dl, plus per-gen corpus
        counters. This is the piece that makes incremental ingest
        O(batch), not O(corpus): every dictionary/stats quantity is
        decomposable (df/cf/total additive, max_tf max, min_dl min), so
        the global refresh merges these small per-gen tables instead of
        re-aggregating every generation's postings per batch."""
        t0 = time.time()
        # explicit schema: also covers an EMPTY generation (zero-row
        # input), whose packed dir has no files to infer from
        blocks = (
            self.spark.read.schema(BLOCK_SCHEMA)
            .parquet(self._p("postings", f"gen={gen}"))
            .select("term", "fld", "n", "sum_tf", "max_tf", "min_dl")
        )
        gdict = blocks.groupBy("term", "fld").agg(
            F.sum("n").alias("df"),
            F.sum("sum_tf").alias("cf"),
            F.max("max_tf").alias("max_tf"),
            F.min("min_dl").alias("min_dl"),
        )
        # per-field totals ride the SAME write action as observed
        # metrics (no read-back aggregation job); fld ordinals are tiny,
        # so fixed per-fld conditional sums cover them
        from pyspark.sql import Observation

        obs = Observation(f"gendict_g{gen}_{time.time_ns()}")
        n_fld = len(self.text_cols)
        metrics = [F.sum("df").alias("n_postings")]
        for f in range(n_fld):
            metrics.append(
                F.sum(F.when(F.col("fld") == f, F.col("cf")).otherwise(0)).alias(f"tok{f}")
            )
        gdict.observe(obs, *metrics).write.mode("overwrite").parquet(
            self._p("dictionary_gens", f"gen={gen}")
        )
        got = obs.get
        by_fld = {str(f): int(got[f"tok{f}"] or 0) for f in range(n_fld)}
        if n_docs is None:
            n_docs = self.spark.read.parquet(self._p("docs", f"gen={gen}")).count()
        self._commit(
            "gendict", gen, None,
            {
                "n_docs": n_docs,
                "total_tokens_by_fld": by_fld,
                "total_tokens": sum(by_fld.values()),
                "n_postings": int(got["n_postings"] or 0),
                "seconds": time.time() - t0,
            },
        )

    def _write_stats(self, n_docs: int, tok_by_fld: dict[int, int]):
        """One atomic JSON file with one row per field. avgdl is per
        FIELD (FTS5 computes per-column average lengths the same way),
        denominated over ALL docs. A single-file atomic write is the
        strongest commit primitive every target filesystem has, so the
        stats flip is crash-safe on POSIX, HDFS and object stores
        alike (the old layout swapped a parquet dir via os.rename)."""
        flds = sorted(tok_by_fld) or [0]
        self.fs.write_json_atomic(
            self._p("stats.json"),
            {
                "by_fld": [
                    {
                        "fld": f,
                        "n_docs": n_docs,
                        "avgdl": (tok_by_fld.get(f, 0) / n_docs) if n_docs else 0.0,
                        "total_tokens": tok_by_fld.get(f, 0),
                    }
                    for f in flds
                ]
            },
        )

    def _set_dictionary_ptr(self, rel_path: str):
        """Flip the global-dictionary pointer (atomic single file), then
        GC superseded merged versions. Readers resolve the pointer at
        snapshot time (SearchEngine caches per refresh())."""
        self.fs.write_json_atomic(
            self._p("dictionary_CURRENT.json"), {"path": rel_path}
        )
        keep = rel_path.split("/")[-1] if rel_path.startswith("dictionary_v/") else None
        for name in self.fs.listdir(self._p("dictionary_v")):
            if name.startswith("v=") and name != keep:
                self.fs.delete(self._p("dictionary_v", name), recursive=True)

    def _next_dict_version(self) -> int:
        mx = -1
        for name in self.fs.listdir(self._p("dictionary_v")):
            if name.startswith("v=") and name[2:].isdigit():
                mx = max(mx, int(name[2:]))
        return mx + 1

    def dictionary_df(self) -> DataFrame:
        return self.spark.read.parquet(dictionary_location(self.index_dir, self.fs))

    def _gen_manifests(self, stage: str) -> dict[int, dict]:
        out = {}
        for rec in self.manifest():
            if rec["stage"] == stage and rec.get("gen") is not None and rec["slice"] is None:
                out[int(rec["gen"])] = rec
        return out

    def _stage_global(self, resume: bool = True):
        """(Re)compute corpus stats + dictionary over ALL generations."""
        self.refresh_global()

    def refresh_global(self):
        """Merge per-generation dictionaries + counters into the global
        dictionary and stats.

        Reads ONLY the small dictionary_gens tables (O(vocab) rows per
        gen), never the raw postings — per-batch cost is independent of
        corpus size. n_docs counts ALL docs including token-less ones
        (summed from per-gen counters), so avgdl = total_tokens / n_docs
        matches the naive definition exactly. The result becomes
        visible by atomically flipping the dictionary pointer + writing
        stats.json — no directory swap."""
        t0 = time.time()
        gens = self._live_gens()
        per_gen = self._gen_manifests("gendict")
        missing = [g for g in gens if g not in per_gen]
        if missing:
            raise RuntimeError(f"gendict manifest missing for generations {missing}")
        if not gens:
            # fully pruned corpus: empty dictionary version, zeroed stats
            v = self._next_dict_version()
            empty = self.spark.createDataFrame(
                [], "term string, fld int, df long, cf long, max_tf int, min_dl int"
            )
            empty.write.mode("overwrite").parquet(self._p("dictionary_v", f"v={v}"))
            self._set_dictionary_ptr(f"dictionary_v/v={v}")
            self._write_stats(0, {})
            self._commit(
                "global", 0, None,
                {"n_docs": 0, "avgdl": 0.0, "total_tokens": 0, "n_postings": 0,
                 "seconds": time.time() - t0},
            )
            return
        if len(gens) == 1:
            # single generation: the global dictionary IS the gen
            # dictionary — the pointer references it directly (zero
            # copies, no Spark job, no rename)
            self._set_dictionary_ptr(f"dictionary_gens/gen={gens[0]}")
        else:
            v = self._next_dict_version()
            merged = (
                self.spark.read.parquet(
                    *[self._p("dictionary_gens", f"gen={g}") for g in gens]
                )
                .groupBy("term", "fld")
                .agg(
                    F.sum("df").alias("df"),
                    F.sum("cf").alias("cf"),
                    F.max("max_tf").alias("max_tf"),
                    F.min("min_dl").alias("min_dl"),
                )
            )
            merged.write.mode("overwrite").parquet(self._p("dictionary_v", f"v={v}"))
            self._set_dictionary_ptr(f"dictionary_v/v={v}")
        n_docs = sum(per_gen[g]["n_docs"] for g in gens)
        n_postings = sum(per_gen[g]["n_postings"] for g in gens)
        tok_by_fld: dict[int, int] = {}
        for g in gens:
            for f, v in per_gen[g]["total_tokens_by_fld"].items():
                tok_by_fld[int(f)] = tok_by_fld.get(int(f), 0) + v
        total_tokens = sum(tok_by_fld.values())
        self._write_stats(n_docs, tok_by_fld)
        avgdl0 = (tok_by_fld.get(0, 0) / n_docs) if n_docs else 0.0
        self._commit(
            "global", 0, None,
            {"n_docs": n_docs, "avgdl": avgdl0, "total_tokens": total_tokens,
             "n_postings": n_postings, "seconds": time.time() - t0},
        )

    def _pack_and_write(self, raw_df: DataFrame, gen: int, heavy_df: DataFrame):
        """Shared pack tail: salt-assign, shuffle by (slice, term, fld,
        salt), pack into blocks, write ``postings/gen=G`` and commit the
        gen-level pack manifest with per-slice metrics. ``raw_df`` is
        any RAW_SCHEMA plan (the fused tokenizer for a build, the block
        unpacker for compact/prune) — the salt join stays JVM-side via
        broadcast of the tiny heavy-term plan."""
        t0 = time.time()
        raw = (
            raw_df.join(F.broadcast(heavy_df), ["term", "fld"], "left")
            .withColumn(
                "salt",
                F.pmod(
                    F.xxhash64(F.lit(13), F.col("doc_id")),
                    F.coalesce(F.col("n_salts"), F.lit(1)),
                ).cast("int"),
            )
            .drop("n_salts")
        )
        n_shuffle = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        packed = raw.repartition(n_shuffle, "slice", "term", "fld", "salt").mapInArrow(
            _pack_partition_arrow_factory(self.block_size, self.store_positions),
            BLOCK_SCHEMA,
        )
        self._write_packed(packed, gen, t0)

    def _write_packed(self, packed: DataFrame, gen: int, t0: float):
        """Shared pack-output tail: write ``postings/gen=G`` and commit
        the gen-level pack manifest with metrics riding the write."""
        # metrics ride the write itself as an Observation — no second
        # job, no metadata re-read of the parquet we just wrote.
        # (observe cannot carry distinct aggregates or a groupBy, so the
        # term count is approximate and the per-slice breakdown is
        # replaced by the slice count; nothing downstream needed more.)
        from pyspark.sql import Observation

        obs = Observation(f"pack_g{gen}_{time.time_ns()}")
        packed.observe(
            obs,
            F.sum("n").alias("n_postings"),
            F.count(F.lit(1)).alias("n_blocks"),
            (
                F.sum(F.coalesce(F.octet_length("doc_gaps"), F.lit(0)))
                + F.sum(F.coalesce(F.octet_length("tfs"), F.lit(0)))
                + F.sum(F.coalesce(F.octet_length("dls"), F.lit(0)))
                + F.sum(F.coalesce(F.octet_length("positions"), F.lit(0)))
            ).alias("bytes_packed"),
            F.approx_count_distinct("term").alias("n_terms_approx"),
            (F.max("slice") + 1).alias("n_slices_seen"),
        ).write.mode("overwrite").partitionBy("slice").parquet(
            self._p("postings", f"gen={gen}")
        )
        m = obs.get
        self._commit(
            "pack",
            gen,
            None,
            {
                "seconds": time.time() - t0,
                "n_postings": int(m["n_postings"] or 0),
                "n_blocks": int(m["n_blocks"] or 0),
                "bytes_packed": int(m["bytes_packed"] or 0),
                "n_terms_approx": int(m["n_terms_approx"] or 0),
                "n_slices_seen": int(m["n_slices_seen"] or 0),
            },
        )

    def _stage_pack_fused(self, df: DataFrame, gen: int):
        """tokenize -> partial blocks -> shuffle -> pack, in ONE job
        (the only pass over the corpus text and the only data shuffle
        of the build). The shuffle moves PARTIAL_SCHEMA rows — one per
        (map task, slice, term, fld) group with delta+varint payloads —
        not one row per posting. Salting is decided INSIDE the map
        tasks (local cumulative threshold, see _emit_partials): no
        global heavy-term probe job runs, so the pack job is the
        build's FIRST job over the corpus text and nothing gates it.
        The threshold ~ salt_max_postings / n_map_tasks keeps the old
        reducer-bound contract (an unsalted group's reducer receives
        at most ~salt_max postings in total)."""
        t0 = time.time()
        try:
            n_map = max(1, df.rdd.getNumPartitions())
        except Exception:
            n_map = 32
        threshold = max(
            self.block_size, self.salt_max_postings // n_map
        )
        n_shuffle = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        packed = self._tokenized(
            df, partial_salt_threshold=threshold
        ).repartition(
            n_shuffle, "slice", "term", "fld", "salt"
        ).mapInArrow(
            _pack_partials_arrow_factory(self.block_size, self.store_positions),
            BLOCK_SCHEMA,
        )
        self._write_packed(packed, gen, t0)

    def _unpacked_postings(self, gens: list[int]) -> DataFrame:
        """Shuffle-ready postings reconstructed from the packed blocks
        of ``gens`` (with a ``gen`` column), for compaction/retention
        rewrites. Position payloads are re-sliced, never decoded."""
        blocks = self.spark.read.option("basePath", self._p("postings")).parquet(
            *[self._p("postings", f"gen={g}") for g in gens]
        ).select(
            "slice", "term", "fld", "n", "doc_gaps", "tfs", "dls", "positions", "gen"
        )
        return blocks.mapInArrow(
            _unpack_blocks_to_raw_factory(self.store_positions, with_gen=True),
            RAW_SCHEMA + ", gen int",
        )


    def repair(self) -> dict:
        """Roll pending compaction/prune markers forward, garbage-collect
        orphan generation state (data/manifests written by a crashed
        build that never committed its raw manifest — invisible by the
        liveness rule, reclaimed here), rebuild any live generation's
        missing dictionary from its packed metadata, and refresh the
        global view if it lags the live set. Cheap when healthy —
        manifest-existence checks only, no Spark jobs.

        A generation's raw manifest commits only AFTER docs + packed
        postings + per-gen dictionary are all on disk, so a LIVE
        generation with missing packed data can only mean external
        damage — that is surfaced as an error (restore from snapshot or
        re-ingest the batch), never silently dropped."""
        self._finish_pending_compaction()
        self._apply_pending_prune()
        live = set(self._live_gens())
        gc: list[str] = []
        for sub in ("docs", "postings_raw", "postings", "dictionary_gens"):
            for name in self.fs.listdir(self._p(sub)):
                if not (name.startswith("gen=") and name[4:].isdigit()):
                    continue
                if int(name[4:]) not in live:
                    self.fs.delete(self._p(sub, name), recursive=True)
                    gc.append(f"{sub}/{name}")
        # stale sub-stage manifests of crashed (non-live) builds
        for name in self.fs.listdir(self._p("manifest")):
            for st in ("pack", "gendict"):
                if name.startswith(f"{st}_g") and name.endswith(".json"):
                    body = name[len(st) + 2 : -len(".json")].split("_")[0]
                    if body.isdigit() and int(body) not in live:
                        self.fs.delete(self._p("manifest", name))
                        gc.append(f"manifest/{name}")
        touched = []
        for g in sorted(live):
            if not self.fs.exists(
                os.path.join(self._p("postings", f"gen={g}"), "_SUCCESS")
            ):
                raise RuntimeError(
                    f"generation {g} is live but its packed postings are "
                    "missing or incomplete — the index is externally "
                    "damaged; restore from a snapshot or re-ingest the "
                    "generation's source batch"
                )
            if not self._manifest_done("gendict", g):
                self._stage_gen_dict(g)
                touched.append(g)
        if touched or self._global_stale():
            self.refresh_global()
        return {"repaired": touched, "gc": gc}

    def _global_stale(self) -> bool:
        """True when the committed global stats lag the live generation
        set (crash between a generation's liveness flip and its
        refresh). Manifest reads only — no Spark jobs."""
        live = self._live_gens()
        if live and not (
            self.fs.exists(self._p("dictionary_CURRENT.json"))
            and self.fs.exists(self._p("stats.json"))
        ):
            # a vanished pointer/stats file (e.g. crash inside a
            # non-overwrite rename fallback) is re-derivable state
            return True
        per_gen = self._gen_manifests("gendict")
        if any(g not in per_gen for g in live):
            return True
        expected = sum(per_gen[g]["n_docs"] for g in live)
        for rec in self.manifest():
            if rec["stage"] == "global":
                return int(rec.get("n_docs", -1)) != expected
        return bool(live) or expected > 0

    def _compact_marker(self) -> str:
        return self._p("manifest", "compact_pending.json")

    # -- retention prune (S9: index segments dropped by time) ----------
    def _prune_marker(self) -> str:
        return self._p("manifest", "prune_pending.json")

    def _apply_pending_prune(self):
        """Roll a persisted prune decision forward (idempotent): dropped
        generations lose their manifests then their data; rewritten
        generations' filtered copies — fully written (docs, packed
        postings, dictionary) to their FINAL new-generation directories
        before the marker committed — become live by raw-manifest
        commit and the originals are retired. No directory is ever
        renamed."""
        marker = self._prune_marker()
        if not self.fs.exists(marker):
            return
        pend = self.fs.read_json(marker)
        subs = ("docs", "postings_raw", "postings", "dictionary_gens")
        for g in pend["drop"]:
            self._clear_gen_manifests(g)
            for d in subs:
                self.fs.delete(self._p(d, f"gen={g}"), recursive=True)
        for g, tgt in pend["rewrite"]:
            self._clear_gen_manifests(g)
            for d in subs:
                self.fs.delete(self._p(d, f"gen={g}"), recursive=True)
            if not self._manifest_done("gendict", tgt):
                # defensive: derivable from the packed copy
                self._stage_gen_dict(tgt)
            # liveness flip: the filtered copy becomes the generation
            self._commit("raw", tgt, None, {"seconds": 0.0, "pruned_from": g})
        self.refresh_global()
        self.fs.delete(marker)

    def prune_index(self, cutoff_ts, ts_col: str = "ts") -> dict:
        """Drop index segments older than ``cutoff_ts`` (docs with
        ts < cutoff stop matching and stats/dictionary shrink
        accordingly) — the index-side analog of the reference's hourly
        `DELETE FROM statuses WHERE created < cutoff` (db_sqlite.py:
        46-52), where the FTS5 delete-triggers prune postings in step.

        Whole generations past the cutoff are dropped O(1) (manifest +
        directory removal — the Iceberg `days(ts)` partition-drop
        analog); boundary generations are rewritten as NEW generations:
        filtered docs + raw postings land directly in fresh gen
        directories (invisible until their manifest commits), then a
        single atomic marker records the drop/rewrite decision and
        `_apply_pending_prune` rolls it forward — on this call or, after
        a crash at ANY point, on the next one. Offline op, like
        compact()."""
        t0 = time.time()
        self._apply_pending_prune()
        if ts_col not in self.meta_cols:
            raise ValueError(f"retention prune needs '{ts_col}' in meta_cols")
        gens = self._live_gens()
        drop, rewrite = [], []
        for g in gens:
            docs_g = self.spark.read.parquet(self._p("docs", f"gen={g}"))
            mm = docs_g.agg(
                F.min(ts_col).alias("lo"),
                F.max(ts_col).alias("hi"),
                F.sum(F.col(ts_col).isNull().cast("long")).alias("n_null"),
            ).collect()[0]
            if mm["hi"] is None:
                continue  # all-NULL timestamps: no evidence of age, keep
            if mm["hi"] < cutoff_ts:
                # fast whole-gen drop is only safe when the generation
                # holds NO undated docs — retention must never delete
                # what it cannot date, and min/max ignore NULLs, so a
                # gen of old+NULL rows routes through the rewrite path
                # (whose filter keeps ts IS NULL)
                if mm["n_null"]:
                    rewrite.append(g)
                else:
                    drop.append(g)
            elif mm["lo"] >= cutoff_ts:
                continue
            else:
                rewrite.append(g)
        if not drop and not rewrite:
            return {"pruned": False, "dropped": [], "rewritten": []}
        # rewritten content goes straight to FRESH generation ids: the
        # data is complete on disk before the marker commits, and the
        # new gens stay invisible (no raw manifest) until roll-forward
        next_id = self._next_gen_id()
        pairs = []
        for g in rewrite:
            tgt, next_id = next_id, next_id + 1
            docs_g = self.spark.read.parquet(self._p("docs", f"gen={g}"))
            # NULL-ts docs are not "older than cutoff" — retention must
            # never delete what it cannot date
            kept = docs_g.filter(
                (F.col(ts_col) >= F.lit(cutoff_ts)) | F.col(ts_col).isNull()
            )
            kept.write.mode("overwrite").parquet(self._p("docs", f"gen={tgt}"))
            kept_ids = self.spark.read.parquet(
                self._p("docs", f"gen={tgt}")
            ).select("doc_id")
            filtered = (
                self._unpacked_postings([g])
                .drop("gen")
                .join(kept_ids, "doc_id", "left_semi")
            )
            self._pack_and_write(filtered, tgt, self._salt_plan(None))
            self._stage_gen_dict(tgt)
            pairs.append([g, tgt])
        self.fs.write_json_atomic(
            self._prune_marker(), {"drop": drop, "rewrite": pairs}
        )
        self._apply_pending_prune()
        return {
            "pruned": True,
            "dropped": drop,
            "rewritten": rewrite,
            "rewritten_to": [t for _, t in pairs],
            "seconds": time.time() - t0,
        }

    def _finish_pending_compaction(self):
        """Crash recovery: complete (or roll back) an interrupted compact.

        The merged output — docs, packed postings AND per-gen
        dictionary — was written DIRECTLY to the target generation's
        final directories before the marker committed (invisible — no
        raw manifest). Roll-forward: retire the sources (manifests then
        data), flip the target live by committing its raw manifest,
        refresh the global view, clear the marker. Every step is an
        idempotent atomic file write or delete; a replay from any crash
        point converges."""
        marker = self._compact_marker()
        if not self.fs.exists(marker):
            return None
        pend = self.fs.read_json(marker)
        target = pend["target"]
        t_packed = self._p("postings", f"gen={target}")
        t_docs = self._p("docs", f"gen={target}")
        committed = self._manifest_done("raw", target)
        packed_ok = self.fs.exists(os.path.join(t_packed, "_SUCCESS"))
        docs_ok = self.fs.exists(os.path.join(t_docs, "_SUCCESS"))
        if not committed and not (packed_ok and docs_ok):
            # merged copies incomplete (crash mid-write... but the marker
            # only commits after the writes — this is the defensive
            # branch): roll back, sources are intact
            self.fs.delete(t_packed, recursive=True)
            self.fs.delete(t_docs, recursive=True)
            self.fs.delete(self._p("dictionary_gens", f"gen={target}"), recursive=True)
            self._clear_gen_manifests(target)
            self.fs.delete(marker)
            return "rolled_back"
        for g in pend["sources"]:
            self._clear_gen_manifests(g)
            for sub in ("docs", "postings_raw", "postings", "dictionary_gens"):
                self.fs.delete(self._p(sub, f"gen={g}"), recursive=True)
        if not self._manifest_done("gendict", target):
            # defensive: derivable from the packed copy
            self._stage_gen_dict(target)
        self._commit(
            "raw", target, None, {"seconds": 0.0, "compacted_from": pend["sources"]}
        )
        self.refresh_global()
        # re-slicing goes live with the same roll-forward (idempotent
        # atomic meta rewrite; a replay after a crash converges here too)
        meta_n = pend.get("n_slices")
        if meta_n is not None and int(meta_n) != self.n_slices:
            m = self.fs.read_json(self._p("index_meta.json"))
            m["n_slices"] = int(meta_n)
            self.fs.write_json_atomic(self._p("index_meta.json"), m)
            self.n_slices = int(meta_n)
        self.fs.delete(marker)
        return "completed"

    def _slice_expr(self, n_slices: int):
        return F.pmod(
            F.xxhash64(F.lit(7), F.col("doc_id")), F.lit(n_slices)
        ).cast("int")

    def compact(self, n_slices: int | None = None) -> dict:
        """Merge all generations into a single segment set.

        ``n_slices`` re-slices the index during the merge (the slice
        column is recomputed from doc_id for both the docs and the
        unpacked postings before the repack — no rebuild from source
        text needed). This lifts the phrase-matching parallelism
        ceiling of an index built with few slices (engine.py slice
        notes): build small, compact wider as the corpus grows. The new
        slicing goes live atomically with the compaction itself —
        index_meta.json is rewritten during the marker roll-forward, so
        a crash at any point leaves meta and live data consistent.

        The Lucene-merge analog for the incremental path: many small
        per-batch generations make query-side scans open many files;
        compaction unpacks the sources' packed blocks back into
        shuffle-ready postings (positions re-sliced, never decoded),
        merges/repacks them with the docs as one NEW generation.
        Crash-safe ordering: (1) write the merged docs, packed postings
        and per-gen dictionary directly to the target generation's
        directories (invisible — liveness is manifest-based, never
        directory-based), (2) persist the pending marker (one atomic
        file), (3) retire sources + commit the target's raw manifest +
        refresh the global view + clear the marker — a crash at any
        point either rolls back or is completed by
        `_finish_pending_compaction` / `repair()` on the next call.
        No directory renames, so the ordering holds on HDFS/S3 too.
        Offline op: run it when no queries are in flight."""
        t0 = time.time()
        self._finish_pending_compaction()
        new_n = self.n_slices if n_slices is None else int(n_slices)
        gens = self._live_gens()
        if len(gens) <= 1 and new_n == self.n_slices:
            # nothing to merge; still heal any stale global view left
            # by an interrupted earlier lifecycle op
            self.repair()
            return {"compacted": False, "gens": len(gens)}
        if not gens:
            # nothing to merge/re-slice, but an explicit n_slices request
            # must not be silently ignored (ADVICE r4): with zero live
            # generations there is no data, so the new slicing can go
            # live by rewriting the meta directly.
            if new_n != self.n_slices and self.fs.exists(self._p("index_meta.json")):
                m = self.fs.read_json(self._p("index_meta.json"))
                m["n_slices"] = new_n
                self.fs.write_json_atomic(self._p("index_meta.json"), m)
                self.n_slices = new_n
                return {"compacted": False, "gens": 0, "n_slices_set": new_n}
            return {"compacted": False, "gens": 0}
        target = self._next_gen_id()
        # Late-duplicate healing: a key re-ingested after the streaming
        # dedup horizon expired exists in TWO generations under the same
        # doc_id (the reference's DB unique constraint has no analog in
        # plain parquet appends). Compaction is the exact-once repair
        # pass: keep each doc_id's LATEST generation row and only that
        # generation's postings.
        from pyspark.sql import Window

        docs_all = self.spark.read.option("basePath", self._p("docs")).parquet(
            *[self._p("docs", f"gen={g}") for g in gens]
        )  # + gen partition col (live gens only)
        w = Window.partitionBy("doc_id").orderBy(F.col("gen").desc())
        docs_kept = (
            docs_all.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # direct write to the FINAL directories: invisible until the
        # roll-forward commits the target's raw manifest
        docs_out = docs_kept.drop("gen")
        if new_n != self.n_slices:
            docs_out = docs_out.withColumn("slice", self._slice_expr(new_n))
        docs_out.write.mode("overwrite").parquet(self._p("docs", f"gen={target}"))
        # postings reconstructed from the packed blocks (no raw table);
        # the (doc_id, gen) semi-join drops superseded duplicates'
        # postings along with their doc rows
        merged = (
            self._unpacked_postings(gens)
            .join(docs_kept.select("doc_id", "gen"), ["doc_id", "gen"], "left_semi")
            .drop("gen")
        )
        if new_n != self.n_slices:
            merged = merged.withColumn("slice", self._slice_expr(new_n))
        self._pack_and_write(merged, target, self._salt_plan(None))
        self._stage_gen_dict(target)
        self.fs.write_json_atomic(
            self._compact_marker(),
            {"sources": gens, "target": target, "n_slices": new_n},
        )
        # retire sources + flip liveness + refresh global view
        status = self._finish_pending_compaction()
        if status != "completed":
            # defensive: the merged copies were validated incomplete and
            # rolled back — report the failure instead of claiming success
            raise RuntimeError(
                "compaction output failed completeness validation "
                "(missing _SUCCESS markers) and was rolled back"
            )
        return {"compacted": True, "gens_merged": len(gens), "seconds": time.time() - t0}


def build_index(spark: SparkSession, df: DataFrame, index_dir: str, **kwargs) -> IndexBuilder:
    b = IndexBuilder(spark, index_dir, **kwargs)
    b.build(df)
    return b
