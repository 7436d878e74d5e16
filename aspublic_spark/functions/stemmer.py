"""Porter stemmer + the Postgres-style 'english' analyzer (T2).

The reference's Postgres backend indexes
``to_tsvector('english', text)`` (common/db_postgres.py:29-31), i.e.
lowercased word tokens minus stopwords, stemmed with the snowball
english stemmer. This module provides that analyzer surface for the
Spark index: the classic Porter (1980) algorithm — snowball 'english'
is Porter2, a descendant with slightly different suffix rules; the
divergence is documented and the FTS5 analyzer remains the
rank-identity backend (SURVEY T1/T2 fork).

The stemmer is a pure function (dict-cached), applied inside the same
Arrow-batched raw-postings pass as tokenization — no extra column
scans, no shuffle.
"""

from __future__ import annotations

from aspublic_spark.functions.tokenizer import tokenize

_VOWELS = set("aeiou")

# snowball/Postgres 'english' stopword list (tsearch english.stop)
STOPWORDS_TSVECTOR_EN = frozenset(
    """i me my myself we our ours ourselves you your yours yourself yourselves
    he him his himself she her hers herself it its itself they them their
    theirs themselves what which who whom this that these those am is are was
    were be been being have has had having do does did doing a an the and but
    if or because as until while of at by for with about against between into
    through during before after above below to from up down in out on off
    over under again further then once here there when where why how all any
    both each few more most other some such no nor not only own same so than
    too very s t can will just don should now""".split()
)


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V] — the number of vowel->consonant transitions."""
    n, i, ln = 0, 0, len(stem)
    while i < ln and _cons(stem, i):
        i += 1
    while True:
        while i < ln and not _cons(stem, i):
            i += 1
        if i >= ln:
            return n
        n += 1
        while i < ln and _cons(stem, i):
            i += 1
        if i >= ln:
            return n


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: ends consonant-vowel-consonant, last not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _cons(w, len(w) - 3)
        and not _cons(w, len(w) - 2)
        and _cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _rule_set(w: str, rules: list[tuple[str, str, int]]) -> str:
    """Apply the first (longest-listed-first) matching suffix rule whose
    m-condition holds; a matching suffix with a failing condition still
    terminates the step (Porter semantics)."""
    for suf, rep, m_min in rules:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > m_min:
                return stem + rep
            return w
    return w


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0)
    w = _rule_set(
        w,
        [
            ("ational", "ate", 0), ("tional", "tion", 0), ("enci", "ence", 0),
            ("anci", "ance", 0), ("izer", "ize", 0), ("abli", "able", 0),
            ("alli", "al", 0), ("entli", "ent", 0), ("eli", "e", 0),
            ("ousli", "ous", 0), ("ization", "ize", 0), ("ation", "ate", 0),
            ("ator", "ate", 0), ("alism", "al", 0), ("iveness", "ive", 0),
            ("fulness", "ful", 0), ("ousness", "ous", 0), ("aliti", "al", 0),
            ("iviti", "ive", 0), ("biliti", "ble", 0),
        ],
    )

    # step 3 (m > 0)
    w = _rule_set(
        w,
        [
            ("icate", "ic", 0), ("ative", "", 0), ("alize", "al", 0),
            ("iciti", "ic", 0), ("ical", "ic", 0), ("ful", "", 0),
            ("ness", "", 0),
        ],
    )

    # step 4 (m > 1); (s|t)ion handled with its stem condition
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# bounded: executors are long-lived and web-scale vocabularies reach
# 10^7+ distinct tokens per worker — an unbounded dict would grow for
# the life of the process. LRU keeps the Zipf head hot.
import functools

_stem_cached = functools.lru_cache(maxsize=1 << 18)(porter_stem)


def tokenize_english(text: str | None) -> list[str]:
    """to_tsvector('english')-style analysis: unicode word split +
    lowercase (shared tokenizer), stopword drop, Porter stem."""
    return [
        _stem_cached(t) for t in tokenize(text) if t not in STOPWORDS_TSVECTOR_EN
    ]


ANALYZERS = {"fts5": tokenize, "english": tokenize_english}


def get_analyzer(name: str):
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; options: {sorted(ANALYZERS)}")
