"""FTS5 NEAR proximity queries (parse_fts5 extension).

Semantics pinned by LIVE FTS5 probes (stdlib sqlite3): for
single-token operands, ``NEAR(t1 .. tk, n)`` matches a doc iff one
occurrence of each DISTINCT operand can be chosen within a single
column such that max(pos) - min(pos) <= n + 1; duplicate operands
collapse; a single-operand NEAR is a plain term; default n is 10.
The reference's sqlite backend passes its MATCH string straight to
FTS5 (db_sqlite.py:131), so this operator is part of the backend's
native query language even though translateSearchString never emits
it."""

import os
import random
import sqlite3

import pytest
from pyspark.sql import functions as F

from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.query import SearchEngine, parse_fts5
from aspublic_spark.query.parser import parse_query


def _fts5_available() -> bool:
    try:
        sqlite3.connect(":memory:").execute(
            "CREATE VIRTUAL TABLE _p USING fts5(t)"
        )
        return True
    except sqlite3.OperationalError:
        return False


# ---------------------------------------------------------------- parser
def test_parse_fts5_near_groups():
    p = parse_fts5("NEAR(Alpha beta, 3) gamma !delta")
    assert p.nears == [(["alpha", "beta"], 3)]
    assert p.and_terms == ["gamma"] and p.not_terms == ["delta"]
    # default n = 10 (FTS5 doc'd default, confirmed by probe)
    assert parse_fts5("NEAR(a b)").nears == [(["a", "b"], 10)]
    # duplicate operands collapse; a single operand is a plain term
    # (probed: NEAR(a a, 0) matches a doc with ONE 'a')
    p2 = parse_fts5('NEAR(a a, 2) "x y"')
    assert p2.nears == [] and p2.and_terms == ["a"]
    assert p2.phrases == [["x", "y"]]
    # keyword is case-sensitive like FTS5's: lowercase near( is text
    assert parse_fts5("near(a b)").nears == []
    assert parse_fts5("near(a b)").and_terms == ["near", "a", "b"]
    # plain parse_query never produces NEAR groups
    assert parse_query("NEAR(a b, 2)").nears == []


# ----------------------------------------------------- engine vs live FTS5
@pytest.mark.skipif(not _fts5_available(), reason="sqlite without FTS5")
def test_near_differential_vs_live_fts5(spark, workdir):
    """300 random docs, 20+ NEAR query shapes: the engine's matched doc
    set must equal live FTS5's rowid set exactly."""
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta"] + ["x"] * 6
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 14)))
        for _ in range(300)
    ]

    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE f USING fts5(text, tokenize='unicode61')")
    for d in docs:
        db.execute("INSERT INTO f VALUES (?)", (d,))

    idx = os.path.join(workdir, "near_diff_idx")
    sdf = spark.createDataFrame(
        [(i + 1, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    b = IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_col="text", meta_cols=[],
        n_slices=3, block_size=8,
    )
    b.build(sdf)
    eng = SearchEngine(spark, idx)

    shapes = []  # (engine query, FTS5 MATCH string)
    for terms in (["alpha", "beta"], ["alpha", "beta", "gamma"],
                  ["alpha", "beta", "gamma", "delta"], ["alpha", "alpha", "beta"]):
        for n in (0, 1, 2, 5, 10):
            q = f"NEAR({' '.join(terms)}, {n})"
            shapes.append((q, q))
    shapes.append(("NEAR(alpha beta)",) * 2)  # default n
    shapes.append(("NEAR(alpha beta, 1) gamma",) * 2)  # implicit AND on top
    # NOT: ours spells it !term, FTS5 spells it NOT
    shapes.append(("NEAR(alpha beta, 1) !delta", "NEAR(alpha beta, 1) NOT delta"))

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


def test_near_single_field_locality_and_scoring(spark, workdir):
    """NEAR never matches across columns (probed), absent terms empty
    the result, and NEAR terms score exactly like the same AND query
    (FTS5 bm25 scores the member terms; proximity only gates matching)."""
    idx = os.path.join(workdir, "near_2f_idx")
    rows = [
        # doc 1: alpha..beta within text only
        (1, "alpha x beta", "zz"),
        # doc 2: alpha in text, beta in subject — must NOT match
        (2, "alpha x x", "beta"),
        # doc 3: far apart in text
        (3, "alpha " + "x " * 30 + "beta", "zz"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string, subject string")
    b = IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_cols=["text", "subject"],
        meta_cols=[], n_slices=2, block_size=8,
    )
    b.build(sdf)
    eng = SearchEngine(spark, idx)

    got = {r["doc_id"] for r in
           eng.search("NEAR(alpha beta, 5)", k=10, parser=parse_fts5).df.collect()}
    assert got == {1}
    # wide window still can't cross fields
    got = {r["doc_id"] for r in
           eng.search("NEAR(alpha beta, 100)", k=10, parser=parse_fts5).df.collect()}
    assert got == {1, 3}
    # absent operand -> empty result (conjunctive, like AND/phrase)
    assert eng.search(
        "NEAR(alpha zzznope, 5)", k=10, parser=parse_fts5
    ).df.count() == 0
    # scoring identity: NEAR(a b, big) == "a b" AND query scores where
    # both match (same scaled_map, same fold)
    near = {(r["doc_id"], round(r["score"], 9)) for r in
            eng.search("NEAR(alpha beta, 100)", k=10, parser=parse_fts5).df.collect()}
    anded = {(r["doc_id"], round(r["score"], 9)) for r in
             eng.search("alpha beta", k=10).df.collect()
             if r["doc_id"] in {1, 3}}
    assert near == anded


def test_near_blockmax_forced_is_identical_and_theta_gated(spark, workdir):
    """With pruning forced on, a NEAR query must return identical
    results to the exhaustive plan, and theta pruning must NOT fire
    (the probe's k-th score ignores the window constraint, so it is a
    superset bound — pruning with it could drop true results)."""
    idx = os.path.join(workdir, "near_bm_idx")
    rng = random.Random(13)
    vocab = ["alpha", "beta", "x", "y"]
    rows = [
        (i + 1, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 12))))
        for i in range(120)
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_col="text", meta_cols=[],
        n_slices=2, block_size=8,
    ).build(sdf)

    plain = SearchEngine(spark, idx)
    forced = SearchEngine(spark, idx, prune_min_postings=0)
    q = "NEAR(alpha beta, 1)"
    a = [(r["doc_id"], round(r["score"], 9))
         for r in plain.search(q, k=50, parser=parse_fts5).df.collect()]
    res = forced.search(q, k=50, parser=parse_fts5)
    bb = [(r["doc_id"], round(r["score"], 9)) for r in res.df.collect()]
    assert a == bb and len(a) > 0
    assert not res.pruning.get("theta_pruned", False)


def test_near_through_server_and_cli_flag(spark, workdir):
    """fts5=1 routes the server's query through parse_fts5 (and the
    parsed echo carries the NEAR group); without the flag NEAR( is
    literal text, matching the reference's default surface."""
    import json
    import urllib.request
    from urllib.parse import quote

    from aspublic_spark.server import QueryServer

    idx = os.path.join(workdir, "near_srv_idx")
    rows = [(i + 1, t) for i, t in enumerate(
        ["alpha x beta", "alpha x x x beta", "beta y alpha", "alpha only here"]
    )]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_col="text", meta_cols=[],
        n_slices=2, block_size=8,
    ).build(sdf)

    srv = QueryServer(spark, idx, port=0).start()
    try:
        q = quote("NEAR(alpha beta, 1)")
        res = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/search?q={q}&k=10&fts5=1"
        ).read())
        got = {r["doc_id"] for r in res["results"]}
        assert got == {1, 3}  # windows of 2; doc 2's window is 4
        assert res["debug"]["parsed"]["near"] == [[["alpha", "beta"], 1]]
        # default surface: NEAR( is literal text -> tokenizes to
        # and-terms [near, alpha, beta, 1] -> 'near'/'1' absent -> empty
        res2 = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/search?q={q}&k=10"
        ).read())
        assert res2["results"] == []
    finally:
        srv.stop()


@pytest.mark.skipif(not _fts5_available(), reason="sqlite without FTS5")
def test_anchor_differential_vs_live_fts5(spark, workdir):
    """FTS5 ^-anchor (^term, ^"a b"): live-FTS5 differential over a
    two-column corpus — position 0 of ANY column qualifies (probed)."""
    rng = random.Random(21)
    vocab = ["alpha", "beta", "gamma", "x", "y"]
    rows = []
    for i in range(200):
        t = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
        s = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
        rows.append((i + 1, t, s))

    db = sqlite3.connect(":memory:")
    db.execute(
        "CREATE VIRTUAL TABLE f USING fts5(text, subject, tokenize='unicode61')"
    )
    for _i, t, s in rows:
        db.execute("INSERT INTO f VALUES (?, ?)", (t, s))

    idx = os.path.join(workdir, "anchor_diff_idx")
    sdf = spark.createDataFrame(rows, "doc_id long, text string, subject string")
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_cols=["text", "subject"],
        meta_cols=[], n_slices=2, block_size=8,
    ).build(sdf)
    eng = SearchEngine(spark, idx)

    for q in ('^alpha', '^"alpha beta"', '^alpha gamma', '^alpha !beta'):
        fq = q.replace("!", "NOT ") if "!" in q else q
        want = {
            r[0] for r in db.execute("SELECT rowid FROM f WHERE f MATCH ?", (fq,))
        }
        got = {
            r["doc_id"]
            for r in eng.search(q, k=100, parser=parse_fts5).df.collect()
        }
        if len(want) <= 100:
            assert got == want, (q, sorted(got - want)[:5], sorted(want - got)[:5])
        else:
            assert len(got) == 100 and got <= want, q


# ------------------------------------------------------ column filters
def test_parse_fts5_col_filters():
    p = parse_fts5("Subject:Table query")
    assert p.col_filters == [(("subject",), False, ["table"])]
    assert p.and_terms == ["query"]
    p2 = parse_fts5('text:"a b" !c')
    assert p2.col_filters == [(("text",), False, ["a", "b"])]
    assert p2.not_terms == ["c"]
    # column sets and exclusions (probed FTS5 forms)
    assert parse_fts5("{Text Subject}: a").col_filters == [
        (("text", "subject"), False, ["a"])
    ]
    assert parse_fts5("-text: a").col_filters == [(("text",), True, ["a"])]
    assert parse_fts5('- {text subject}:"a b"').col_filters == [
        (("text", "subject"), True, ["a", "b"])
    ]
    for bad in ("!text: a", "{}: a"):
        with pytest.raises(ValueError):
            parse_fts5(bad)
    # column-filtered NEAR groups and prefixes are supported since the
    # boolean-tree surface (evaluated generically; differentially
    # pinned against live FTS5 in test_fts5_tree.py)
    assert parse_fts5("text: NEAR(a b)").tree.describe() == "(text: (near:10 a b))"
    assert parse_fts5("{text}:a*").tree.describe() == "(text: a*)"


@pytest.mark.skipif(not _fts5_available(), reason="sqlite without FTS5")
def test_col_filter_differential_vs_live_fts5(spark, workdir):
    """col:term / col:"a b" — live-FTS5 differential over a two-column
    corpus where the filtered terms exist in BOTH columns, so the
    restriction is load-bearing for both matching and ranking."""
    rng = random.Random(31)
    vocab = ["alpha", "beta", "gamma", "x", "y"]
    rows = []
    for i in range(200):
        t = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
        s = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))
        rows.append((i + 1, t, s))

    db = sqlite3.connect(":memory:")
    db.execute(
        "CREATE VIRTUAL TABLE f USING fts5(text, subject, tokenize='unicode61')"
    )
    for _i, t, s in rows:
        db.execute("INSERT INTO f VALUES (?, ?)", (t, s))

    idx = os.path.join(workdir, "colf_diff_idx")
    sdf = spark.createDataFrame(rows, "doc_id long, text string, subject string")
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_cols=["text", "subject"],
        meta_cols=[], n_slices=2, block_size=8,
    ).build(sdf)
    eng = SearchEngine(spark, idx)

    for q in ("subject:alpha", "text:alpha", "subject:alpha beta",
              'subject:"alpha beta"', "SUBJECT:alpha !gamma",
              "subject:alpha ^beta",
              # column sets + exclusions (on a 2-col index -subject:
              # == text: — both sides must agree on that too)
              "{text subject}:alpha beta", "{subject}:alpha",
              "-subject:alpha", "-text:alpha beta",
              '-subject:"alpha beta"', "-{subject}:alpha gamma"):
        fq = q.replace("!", "NOT ") if "!" in q else q
        want = {
            r[0] for r in db.execute("SELECT rowid FROM f WHERE f MATCH ?", (fq,))
        }
        got = {
            r["doc_id"]
            for r in eng.search(q, k=100, parser=parse_fts5).df.collect()
        }
        if len(want) <= 100:
            assert got == want, (q, sorted(got - want)[:5], sorted(want - got)[:5])
        else:
            assert len(got) == 100 and got <= want, q

    # unknown column: FTS5's error shape
    with pytest.raises(ValueError, match="no such column: nosuch"):
        eng.search("nosuch:alpha", k=5, parser=parse_fts5)
    # one term both restricted and unrestricted: two independent FTS5
    # phrases — the flat model can't express it, so parse_fts5 falls
    # back to the tree with PER-LEAF restrictions (differential)
    for q in ("subject:alpha alpha", "text:alpha OR subject:alpha"):
        assert parse_fts5(q).tree is not None
        want = {
            r[0] for r in db.execute("SELECT rowid FROM f WHERE f MATCH ?", (q,))
        }
        got = {
            r["doc_id"]
            for r in eng.search(q, k=100, parser=parse_fts5).df.collect()
        }
        if len(want) <= 100:
            assert got == want, q
        else:
            assert len(got) == 100 and got <= want, q


def test_col_filter_restricts_scoring_to_the_column(spark, workdir):
    """The restricted term scores ONLY its column: subject:alpha on a
    doc matching in both columns must equal the subject-field BM25
    contribution alone (checked via field_weights isolation)."""
    idx = os.path.join(workdir, "colf_score_idx")
    rows = [
        (1, "alpha x", "alpha y"),   # alpha in both columns
        (2, "x y", "alpha alpha"),   # alpha in subject only
        (3, "alpha x", "y z"),       # alpha in text only -> excluded
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string, subject string")
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_cols=["text", "subject"],
        meta_cols=[], n_slices=2, block_size=8,
    ).build(sdf)
    eng = SearchEngine(spark, idx)

    got = {r["doc_id"]: r["score"] for r in
           eng.search("subject:alpha", k=10, parser=parse_fts5).df.collect()}
    assert set(got) == {1, 2}
    # reference scores: unrestricted 'alpha' with the text field weight
    # zeroed = subject-only BM25
    want = {r["doc_id"]: r["score"] for r in
            eng.search("alpha", k=10, field_weights=[0.0, 1.0]).df.collect()
            if r["doc_id"] in (1, 2)}
    for d in (1, 2):
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def test_col_filter_blockmax_forced_is_identical(spark, workdir):
    """Forced pruning with a col-filtered query returns identical
    results (col singles are exact AND constraints for the probe; col
    phrases gate theta off like phrases)."""
    idx = os.path.join(workdir, "colf_bm_idx")
    rng = random.Random(43)
    vocab = ["alpha", "beta", "x"]
    rows = [
        (i + 1,
         " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 10))),
         " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4))))
        for i in range(150)
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string, subject string")
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_cols=["text", "subject"],
        meta_cols=[], n_slices=2, block_size=8,
    ).build(sdf)
    plain = SearchEngine(spark, idx)
    forced = SearchEngine(spark, idx, prune_min_postings=0)
    for q in ("subject:alpha beta", 'subject:"alpha beta"'):
        a = [(r["doc_id"], round(r["score"], 9))
             for r in plain.search(q, k=50, parser=parse_fts5).df.collect()]
        bb = [(r["doc_id"], round(r["score"], 9))
              for r in forced.search(q, k=50, parser=parse_fts5).df.collect()]
        assert a == bb and len(a) > 0, q


# -------------------------------------------- NEAR with phrase operands
def test_parse_fts5_near_phrase_operands():
    """FTS5 NEAR operands may be quoted phrases (and `+` concatenations
    of them); all-single-token groups keep the flat plan, phrase
    operands ride the boolean-tree path."""
    p = parse_fts5('NEAR("a b" c, 2)')
    assert p.nears == [] and p.tree.describe() == '(near:2 "a b" c)'
    p2 = parse_fts5('NEAR("one" + "two" three, 1)')
    assert p2.tree.describe() == '(near:1 "one two" three)'
    # single distinct operand degenerates like the single-token form
    assert parse_fts5('NEAR("a b", 5)').phrases == [["a", "b"]]
    assert parse_fts5('NEAR("a b" "a b", 5)').phrases == [["a", "b"]]
    # flat single-token groups are untouched
    assert parse_fts5("NEAR(a b, 2)").nears == [(["a", "b"], 2)]
    with pytest.raises(ValueError):
        parse_fts5('NEAR(a + , 2)')


@pytest.mark.skipif(not _fts5_available(), reason="sqlite without FTS5")
def test_near_phrase_operand_differential_vs_live_fts5(spark, workdir):
    """Randomized pin of the interval window rule — max(start) -
    min(end) <= n + 1 over one occurrence interval per distinct
    operand (reduces to the single-token max-min rule): 400 random
    docs x 24 shapes must match live FTS5's rowid sets exactly."""
    rng = random.Random(97)
    vocab = ["a", "b", "c", "d", "ax"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
        for _ in range(400)
    ]
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE f USING fts5(t, tokenize='unicode61')")
    for d in docs:
        db.execute("INSERT INTO f VALUES (?)", (d,))

    idx = os.path.join(workdir, "nearph_diff_idx")
    sdf = spark.createDataFrame(
        [(i + 1, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_col="text", meta_cols=[],
        n_slices=3, block_size=8,
    ).build(sdf)
    eng = SearchEngine(spark, idx)

    shapes = []
    for inner in ('"a b"', '"a b" c', '"a b" "c d"', '"a b" "b c"',
                  '"a b c" d', 'a "b c" d', 'a + b c', '"a b" + c d',
                  # prefix operands (a* expands to a AND ax — probed
                  # valid FTS5, detached stars bind the previous operand)
                  'a* d', 'a * d', '"c a"* b', 'b + a* c'):
        for n in (0, 1, 3):
            shapes.append(f"NEAR({inner}, {n})")
    for q in shapes:
        want = {
            r[0] for r in db.execute("SELECT rowid FROM f WHERE f MATCH ?", (q,))
        }
        got = {
            r["doc_id"]
            for r in eng.search(q, k=100, parser=parse_fts5).df.collect()
        }
        if len(want) <= 100:
            assert got == want, (q, sorted(got - want)[:5], sorted(want - got)[:5])
        else:
            assert len(got) == 100 and got <= want, q
