"""Golden tests for FTS5 unicode61+remove_diacritics-2 fidelity.

Expected values were produced by probing an actual sqlite FTS5
fts5vocab table with tokenize='unicode61 remove_diacritics 2' (the
reference's configuration, common/db_sqlite.py:27). When the stdlib
sqlite has FTS5 available, a differential test re-verifies live.
"""

import sqlite3

import pytest

from aspublic_spark.functions.tokenizer import tokenize

GOLDEN = [
    ("Héllo Wörld", ["hello", "world"]),
    ("foo_bar baz-qux", ["foo", "bar", "baz", "qux"]),  # '_' is a separator
    ("don't CAFÉ café", ["don", "t", "cafe", "cafe"]),
    ("123 abc123", ["123", "abc123"]),
    ("ŁÓDŹ łódź", ["łodz", "łodz"]),  # stroke kept, acutes folded
    ("naïve NAÏVE", ["naive", "naive"]),
    ("à é", ["a", "e"]),
    ("", []),
    ("   ", []),
    ("!!!", []),
    ("ß STRASSE", ["ß", "strasse"]),  # simple lowercase, no casefold
    ("Ｆｕｌｌｗｉｄｔｈ", ["ｆｕｌｌｗｉｄｔｈ"]),  # no compat normalization
    ("ア\xadカ", ["ア", "カ"]),  # soft hyphen separates
    ("coöperate", ["cooperate"]),
    ("ガ が", ["ガ", "が"]),  # precomposed non-Latin untouched
    ("ά Ά έ", ["ά", "ά", "έ"]),
    ("İstanbul", ["istanbul"]),
    ("ǅungla", ["ǆungla"]),
    ("а́ кот", ["а", "кот"]),  # standalone combining mark dropped
    ("ñ Ñ", ["n", "n"]),
    ("ø Ø", ["ø", "ø"]),  # no decomposition -> kept
    ("å Å", ["a", "a"]),
    ("ĉ Ĉ", ["c", "c"]),
    ("ʰello", ["ʰello"]),  # modifier letters are token chars
    ("¹23", ["¹23"]),
    ("ё Ё", ["ё", "ё"]),  # non-Latin precomposed keeps marks
    ("ṡ Ṡ", ["s", "s"]),
    ("ạ Ạ", ["a", "a"]),  # mark outside 0300-036F still folded (Latin base)
    ("ḹ", ["l"]),  # multiple marks
    ("ǟ", ["a"]),
    ("й Й", ["й", "й"]),
    ("ỹ", ["y"]),
    ("ﬁle", ["ﬁle"]),
    ("Ⅷ", ["ⅷ"]),
    ("x́y", ["xy"]),  # mid-token standalone mark dropped, no split
    ("ガ", ["カ"]),  # decomposed katakana-GA -> base kept
    ("ம்", ["ம"]),
    (None, []),
]


@pytest.mark.parametrize("text,expected", GOLDEN, ids=[repr(c[0])[:24] for c in GOLDEN])
def test_golden(text, expected):
    assert tokenize(text) == expected


def _fts5_tokens(db, text):
    db.execute("DELETE FROM t")
    db.execute("INSERT INTO t VALUES (?)", (text,))
    db.commit()
    # instance rows give per-position tokens -> full multiset + order info
    return [r[0] for r in db.execute("SELECT term FROM ti ORDER BY offset")]


def test_differential_vs_fts5():
    db = sqlite3.connect(":memory:")
    try:
        db.execute(
            "CREATE VIRTUAL TABLE t USING fts5(x, tokenize='unicode61 remove_diacritics 2')"
        )
    except sqlite3.OperationalError:
        pytest.skip("sqlite without FTS5")
    db.execute("CREATE VIRTUAL TABLE ti USING fts5vocab(t, 'instance')")
    import random

    rng = random.Random(42)
    alphabet = "abcXYZ 123 _-!.éàüÉÇßøåŁ漢字котガが'ʰ¹"
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        assert tokenize(s) == _fts5_tokens(db, s), repr(s)


def test_positions_are_array_indices():
    toks = tokenize("a sample status, a sample reply")
    assert toks == ["a", "sample", "status", "a", "sample", "reply"]
    assert [i for i, t in enumerate(toks) if t == "sample"] == [1, 4]
