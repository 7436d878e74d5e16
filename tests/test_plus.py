"""FTS5 ``+`` phrase concatenation (parse_fts5 surface).

Probed live-FTS5 semantics: ``a + b`` is the single PHRASE "a b" —
the operator binds tightest (before NOT/AND/OR and juxtaposition),
is whitespace-insensitive (``a+b`` == ``a + b``), chains
(``a + b + c``), composes with quoted phrases (``"a b" + c``), a
``^`` anchor on the left (the anchor covers the whole concatenated
phrase), a column filter (``text:a + b`` restricts the whole phrase)
and a TRAILING prefix star (``a + b*`` is the prefix phrase
``"a b"*``). Dangling or misplaced ``+`` is an FTS5 syntax error —
including ``c++``, ``+ a``, ``a +``, ``a + OR``, ``a + (x)``,
``a + col:x`` — and raises here the same way.
"""

import os
import random
import sqlite3

import pytest

from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.query import SearchEngine, parse_fts5


def _fts5_available() -> bool:
    try:
        sqlite3.connect(":memory:").execute(
            "CREATE VIRTUAL TABLE _p USING fts5(t)"
        )
        return True
    except sqlite3.OperationalError:
        return False


def test_parse_plus_shapes():
    assert parse_fts5("one + two").phrases == [["one", "two"]]
    assert parse_fts5("one+two").phrases == [["one", "two"]]
    assert parse_fts5("one + two + three").phrases == [["one", "two", "three"]]
    assert parse_fts5('"one two" + three').phrases == [["one", "two", "three"]]
    assert parse_fts5('one + "two three"').phrases == [["one", "two", "three"]]
    # binds tighter than juxtaposition: the trailing x is a plain term
    p = parse_fts5("one + two x")
    assert p.phrases == [["one", "two"]] and p.and_terms == ["x"]
    # anchored concatenation keeps the anchor over the whole phrase
    assert parse_fts5("^one + two").anchors == [["one", "two"]]
    # trailing prefix star -> prefix phrase
    assert parse_fts5("one + tw*").prefix_phrases == [(["one"], "tw")]
    assert parse_fts5('one + "tw x" *').prefix_phrases == [(["one", "tw"], "x")]
    # column filter binds the whole concatenated phrase
    assert parse_fts5("text:one + two").col_filters == [
        (("text",), False, ["one", "two"])
    ]
    # inside OR the concatenated phrase keeps ADJACENCY
    p2 = parse_fts5("one + two OR x")
    assert p2.tree is None and p2.or_phrase_groups == [[["one", "two"]]]


def test_parse_plus_errors_like_fts5():
    for bad in (
        "c++",             # probed: FTS5 syntax error
        "one +",
        "+ one",
        "one ++ two",
        "one + OR",
        "one + (a b)",
        "one + text:two",
        "!one + two",      # negations cannot join a concatenation
        "NEAR(a b, 1) + c",
        "NEAR(a + , 2)",
    ):
        with pytest.raises(ValueError):
            parse_fts5(bad)
    # prefix slots may land ANYWHERE in a concatenation (probed valid
    # FTS5): tw* + one is the phrase [tw-stem, one]
    assert parse_fts5("tw* + one").tree.describe() == '"tw* one"'
    assert parse_fts5("^one + tw*").tree.describe() == '^"one tw*"'


@pytest.mark.skipif(not _fts5_available(), reason="sqlite without FTS5")
def test_plus_differential_vs_live_fts5(spark, workdir):
    rng = random.Random(53)
    vocab = ["one", "two", "three", "four"] + ["x"] * 4
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE f USING fts5(text, tokenize='unicode61')")
    for d in docs:
        db.execute("INSERT INTO f VALUES (?)", (d,))

    idx = os.path.join(workdir, "plus_diff_idx")
    sdf = spark.createDataFrame(
        [(i + 1, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    IndexBuilder(
        spark, idx, key_cols=["doc_id"], text_col="text", meta_cols=[],
        n_slices=3, block_size=8,
    ).build(sdf)
    eng = SearchEngine(spark, idx)

    for q in (
        "one + two",
        "one + two + three",
        '"one two" + three',
        "one + two three",
        "one + two OR four",
        "^one + two",
        "one + tw*",
        "four NOT one + two",   # phrase binds before NOT's right side
        "(one + two) OR (three + four)",
        "tw* + one",            # prefix slot mid-phrase (probed valid)
        "^tw*",                 # anchored prefix
        "^one + tw*",
        '"one two" OR tw* + three',
    ):
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
