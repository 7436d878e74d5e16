"""Property tests for the varint/delta posting-block codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from aspublic_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert codec.decode_varints(codec.encode_varints(arr)).tolist() == vals


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=300, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_doc_delta_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    out = codec.delta_decode_docs(codec.delta_encode_docs(arr))
    assert out.tolist() == arr.tolist()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=100_000), min_size=0, max_size=30),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(pos_lists):
    sorted_lists = [np.sort(np.array(p, dtype=np.uint64)) for p in pos_lists]
    buf = codec.encode_positions(sorted_lists)
    out = codec.decode_positions(buf, len(sorted_lists))
    assert [o.tolist() for o in out] == [s.tolist() for s in sorted_lists]


def test_pack_unpack_block():
    ids = np.array([-900, -5, 0, 3, 1000, 2**40], dtype=np.int64)
    tfs = np.array([1, 2, 3, 1, 9, 300], dtype=np.uint64)
    dls = np.array([10, 20, 30, 10, 15, 400], dtype=np.uint64)
    pos = [np.sort(np.random.RandomState(i).randint(0, 500, size=t)).astype(np.uint64) for i, t in enumerate(tfs)]
    blk = codec.pack_block(ids, tfs, dls, pos)
    assert blk["min_doc"] == -900 and blk["max_doc"] == 2**40 and blk["n"] == 6
    out_ids, out_tfs, out_dls, out_pos = codec.unpack_block(blk, with_positions=True)
    assert out_ids.tolist() == ids.tolist()
    assert out_tfs.tolist() == tfs.tolist()
    assert out_dls.tolist() == dls.tolist()
    assert [p.tolist() for p in out_pos] == [p.tolist() for p in pos]


def test_compression_is_compact():
    # 10k sequential-ish doc ids must take ~1-2 bytes/doc, far below 8
    ids = np.cumsum(np.random.RandomState(0).randint(1, 5, size=10_000)).astype(np.int64)
    buf = codec.delta_encode_docs(ids)
    assert len(buf) < 2 * ids.size


def test_pack_all_blocks_matches_per_block():
    rng = np.random.RandomState(3)
    n = 500
    ids = np.sort(rng.choice(np.arange(-10000, 10000), size=n, replace=False)).astype(np.int64)
    tfs = rng.randint(1, 50, size=n).astype(np.uint64)
    dls = rng.randint(1, 400, size=n).astype(np.uint64)
    pos_lens = tfs.astype(np.int64)
    pos_per_doc = [np.sort(rng.randint(0, 1000, size=int(t))).astype(np.uint64) for t in tfs]
    pos_flat = np.concatenate(pos_per_doc)
    bs = 64
    starts = np.arange(0, n, bs)
    allb = codec.pack_all_blocks(ids, tfs, dls, starts, pos_flat, pos_lens)
    for i, s in enumerate(starts):
        e = min(s + bs, n)
        ref = codec.pack_block(ids[s:e], tfs[s:e], dls[s:e], pos_per_doc[s:e])
        assert allb["n"][i] == ref["n"]
        assert allb["min_doc"][i] == ref["min_doc"] and allb["max_doc"][i] == ref["max_doc"]
        assert allb["doc_gaps"][i] == ref["doc_gaps"], i
        assert allb["tfs"][i] == ref["tfs"]
        assert allb["dls"][i] == ref["dls"]
        assert allb["positions"][i] == ref["positions"], i
        # and the unpack round-trip
        out_ids, out_tfs, out_dls, out_pos = codec.unpack_block(
            {k: allb[k][i] for k in ("doc_gaps", "tfs", "dls", "positions")},
            with_positions=True,
        )
        assert out_ids.tolist() == ids[s:e].tolist()
        assert [p.tolist() for p in out_pos] == [p.tolist() for p in pos_per_doc[s:e]]


def test_encode_grouped_records_matches_encode_positions():
    # the raw stage's per-posting payloads, concatenated, must be
    # byte-identical to the pack-side per-doc record stream
    rng = np.random.default_rng(7)
    groups = [np.sort(rng.choice(5000, size=rng.integers(1, 40), replace=False)) for _ in range(50)]
    flat = np.concatenate(groups)
    lens = np.array([g.size for g in groups], dtype=np.int64)
    payloads = codec.encode_grouped_records(flat, lens)
    assert len(payloads) == 50
    assert b"".join(payloads) == codec.encode_positions([g.astype(np.uint64) for g in groups])
    for p, g in zip(payloads, groups):
        dec = codec.decode_positions(p, 1)[0]
        assert dec.tolist() == g.tolist()


def test_encode_grouped_records_empty():
    assert codec.encode_grouped_records(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)) == []
