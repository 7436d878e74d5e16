"""FTS5 prefix queries (parse_fts5 extension): ``ab*``.

Semantics pinned by LIVE FTS5 probes (stdlib sqlite3):

- ``ab*`` matches any doc containing a token that STARTS with the stem
  (the exact token ``ab`` included); folding applies to both sides.
- The star may be whitespace-separated (``ab *`` is a prefix), but a
  star INSIDE quotes is dropped by the tokenizer (``"ab*"`` is the
  plain term ``ab``).
- ``"a b"*`` is a phrase whose LAST slot is a prefix.
- ``NOT ab*`` (our ``!ab*``) excludes docs with any matching token.
- bm25 scores a prefix as ONE phrase: tf is the total count of
  matching tokens in the doc (a doc with 'abx aby' has tf=2), df is
  the distinct-doc count.
- A bare/leading star is an FTS5 error ("unknown special query").

The reference's sqlite backend hands its MATCH string straight to FTS5
(db_sqlite.py:131), so the prefix form is part of the backend's native
query language; translateSearchString itself quotes every term
(viewer.py:70-79), which is exactly why the DEFAULT parser treats a
starred term as plain text (quoted star is tokenizer-dropped) and only
``parse_fts5`` activates prefixes."""

import math
import os
import random
import sqlite3

import pytest
from pyspark.sql import functions as F

from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.query import SearchEngine, parse_fts5
from aspublic_spark.query.parser import parse_query

BM25_K1, BM25_B = 1.2, 0.75


def _fts5_available() -> bool:
    try:
        sqlite3.connect(":memory:").execute(
            "CREATE VIRTUAL TABLE _p USING fts5(t)"
        )
        return True
    except sqlite3.OperationalError:
        return False


# ---------------------------------------------------------------- parser
def test_parse_fts5_prefix_shapes():
    p = parse_fts5("ab* hello !zz*")
    assert p.prefixes == ["ab"] and p.not_prefixes == ["zz"]
    assert p.and_terms == ["hello"]
    # spaced star binds to the preceding token (probed)
    assert parse_fts5("AB * x").prefixes == ["ab"]
    # star inside quotes is tokenizer-dropped: plain term/phrase
    assert parse_fts5('"ab*"').prefixes == []
    assert parse_fts5('"x ab*"').phrases == [["x", "ab"]]
    # prefix phrase; single-token prefix phrase degrades to a prefix
    assert parse_fts5('"hello wor"*').prefix_phrases == [(["hello"], "wor")]
    assert parse_fts5('"ab"* x').prefixes == ["ab"]
    # duplicates collapse
    assert parse_fts5("ab* ab*").prefixes == ["ab"]
    # the default parser NEVER produces prefixes (reference behavior:
    # translateSearchString quotes terms, so FTS5 drops the star)
    assert parse_query("ab* x").and_terms == ["ab", "x"]


def test_parse_fts5_prefix_unsupported_shapes_raise():
    for bad in (
        "*ab",            # leading star: FTS5 "unknown special query"
        '!"a b"*',        # negated prefix phrase
    ):
        with pytest.raises(ValueError):
            parse_fts5(bad)
    # column-filtered / anchored / NEAR-operand / mid-phrase prefixes
    # are all supported since the boolean-tree surface (probed valid
    # FTS5; evaluated generically, live differentials in
    # test_fts5_tree.py and test_plus.py)
    assert parse_fts5("t:ab*").tree.describe() == "(t: ab*)"
    assert parse_fts5('t:"a b" *').tree.describe() == '(t: "a b*")'
    assert parse_fts5("^ab*").tree.describe() == '^"ab*"'
    assert parse_fts5('^"a b"*').tree.describe() == '^"a b*"'
    assert parse_fts5("NEAR(ab* x, 3)").tree.describe() == "(near:3 ab* x)"


# ----------------------------------------------------- engine vs live FTS5
@pytest.mark.skipif(not _fts5_available(), reason="sqlite without FTS5")
def test_prefix_differential_vs_live_fts5(spark, workdir):
    """300 random docs, the prefix query shapes: the engine's matched
    doc set must equal live FTS5's rowid set exactly (subset when the
    match count exceeds the k clamp)."""
    rng = random.Random(11)
    vocab = [
        "alpha", "alphabet", "alps", "beta", "bet", "better",
        "gamma", "delta", "x", "y", "zq",
    ]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
        for _ in range(300)
    ]
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE f USING fts5(t, tokenize='unicode61')")
    db.executemany(
        "INSERT INTO f(rowid, t) VALUES (?, ?)",
        [(i + 1, d) for i, d in enumerate(docs)],
    )
    idx = os.path.join(workdir, "prefix_diff_idx")
    sdf = spark.createDataFrame(
        [(i + 1, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_col="text", meta_cols=[],
        n_slices=3, block_size=8,
    ).build(sdf)
    eng = SearchEngine(spark, idx)

    shapes = [  # (engine query, FTS5 MATCH string)
        ("alp*", "alp*"),
        ("bet*", "bet*"),
        ("alp* gamma", "alp* AND gamma"),
        ("alp* !beta", "alp* NOT beta"),
        ("!bet* gamma", "gamma NOT bet*"),
        ('"alpha bet"*', '"alpha bet"*'),
        ('"x bet"* delta', '"x bet"* AND delta'),
        ("zz*", "zz*"),          # empty expansion
        ("alp* bet*", "alp* AND bet*"),
        ("zq *", "zq *"),        # spaced star
        ("alphabet*", "alphabet*"),  # single-term expansion
    ]
    for q, fq in shapes:
        want = {
            r[0] for r in db.execute("SELECT rowid FROM f WHERE f MATCH ?", (fq,))
        }
        got = {
            r["doc_id"]
            for r in eng.search(q, k=100, parser=parse_fts5).df.collect()
        }
        if len(want) <= 100:
            assert got == want, (q, sorted(got - want)[:5], sorted(want - got)[:5])
        else:  # engine k-clamps at 100: top-k must be a subset
            assert len(got) == 100 and got <= want, q


def test_prefix_scoring_virtual_term_model(spark, workdir):
    """The stem scores as ONE virtual term: tf summed over matching
    tokens per doc, df = distinct matching docs (FTS5 counts a prefix
    as a single phrase — probed: 'abx aby' outranks one 'abx' at equal
    dl). Checked against a hand BM25 on a fixed corpus."""
    rows = [
        (1, "abx aby pad"),   # tf 2 via two DISTINCT tokens
        (2, "abx abx pad"),   # tf 2 via a repeat
        (3, "abx pad pad"),   # tf 1
        (4, "pad pad pad"),   # no match
        (5, "ab pad pad"),    # the exact stem token matches
    ]
    idx = os.path.join(workdir, "prefix_score_idx")
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_col="text", meta_cols=[],
        n_slices=2, block_size=4,
    ).build(sdf)
    eng = SearchEngine(spark, idx)
    got = {
        r["doc_id"]: r["score"]
        for r in eng.search("ab*", k=10, parser=parse_fts5).df.collect()
    }
    n_docs, avgdl, df_v = 5, 3.0, 4  # docs 1,2,3,5 match
    idf = math.log((n_docs - df_v + 0.5) / (df_v + 0.5) + 1.0)

    def w(tf, dl):
        return idf * tf * (BM25_K1 + 1) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
        )

    want = {1: w(2, 3), 2: w(2, 3), 3: w(1, 3), 5: w(1, 3)}
    assert set(got) == set(want)
    for d, s in want.items():
        assert abs(got[d] - s) < 1e-9, (d, got[d], s)


def test_prefix_single_term_expansion_equals_plain_term(spark, workdir):
    """A stem expanding to exactly ONE dictionary term must score
    identically to the plain-term query (virtual df == term df,
    virtual tf == term tf) — and this path skips the extra df job."""
    rng = random.Random(5)
    vocab = ["uniqword", "alpha", "beta", "pad"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8))))
        for i in range(1, 120)
    ]
    idx = os.path.join(workdir, "prefix_single_idx")
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_col="text", meta_cols=[],
        n_slices=2, block_size=8,
    ).build(spark.createDataFrame(rows, "doc_id long, text string"))
    eng = SearchEngine(spark, idx)
    a = [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search("uniqw*", k=50, parser=parse_fts5).df.collect()
    ]
    b = [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search("uniqword", k=50).df.collect()
    ]
    assert a == b and a


def test_prefix_two_field_and_blockmax_parity(spark, workdir):
    """Prefixes match in ANY field and score per (virtual term, field)
    like the engine's two-field model; the forced block-max plan is
    result-identical (theta gates off, range pruning stays lossless)."""
    rows = [
        (1, "abx pad", "zz"),
        (2, "pad pad", "aby"),   # match only via subject
        (3, "abx pad", "abz"),   # match in both fields
        (4, "pad pad", "zz"),
        (5, "pad abq", "zz"),
    ]
    idx = os.path.join(workdir, "prefix_2f_idx")
    sdf = spark.createDataFrame(rows, "doc_id long, text string, subject string")
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_cols=["text", "subject"],
        meta_cols=[], n_slices=2, block_size=4,
    ).build(sdf)
    eng = SearchEngine(spark, idx)
    res = eng.search("ab*", k=10, parser=parse_fts5).df.collect()
    assert {r["doc_id"] for r in res} == {1, 2, 3, 5}
    scores = {r["doc_id"]: r["score"] for r in res}
    # doc 3 scores in BOTH fields -> strictly above the single-field docs
    assert scores[3] > max(scores[1], scores[2], scores[5])

    eng_forced = SearchEngine(spark, idx, prune_min_postings=0)
    res2 = eng_forced.search("ab*", k=10, parser=parse_fts5).df.collect()
    assert sorted((r["doc_id"], round(r["score"], 9)) for r in res2) == sorted(
        (r["doc_id"], round(r["score"], 9)) for r in res
    )


def test_prefix_expansion_cap_and_refresh(spark, workdir):
    """A stem expanding past prefix_max_expansion raises with the
    remedy; incremental builds + refresh() invalidate the stem cache
    (new matching terms become visible)."""
    rows = [(i, f"tok{i} pad") for i in range(1, 30)]
    idx = os.path.join(workdir, "prefix_cap_idx")
    b = IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_col="text", meta_cols=[],
        n_slices=2, block_size=8,
    )
    b.build(spark.createDataFrame(rows, "doc_id long, text string"))
    eng = SearchEngine(spark, idx, prefix_max_expansion=16)
    with pytest.raises(ValueError, match="lengthen the stem"):
        eng.search("tok*", k=10, parser=parse_fts5)  # 29 terms > 16
    # a tighter stem (tok1, tok10..tok19 = 11 terms) fits the cap
    got = {
        r["doc_id"]
        for r in eng.search("tok1*", k=100, parser=parse_fts5).df.collect()
    }
    assert got == {1} | set(range(10, 20))
    # incremental add: a brand-new matching term appears after refresh
    b.add_documents(
        spark.createDataFrame([(99, "tok1zzz pad")], "doc_id long, text string"),
        gen=1,
    )
    eng.refresh()
    got2 = {
        r["doc_id"]
        for r in eng.search("tok1zzz*", k=10, parser=parse_fts5).df.collect()
    }
    assert got2 == {99}
