"""Google-style query string -> (AND terms, phrases, NOT terms).

Reimplements the observable semantics of the reference's
``searchBackend.translateSearchString`` (viewer.py:62-84), the only
query language the reference exposes:

- ``!word`` or ``-word``      -> NOT term
- ``!"a b"`` or ``-"a b"``    -> negated phrase; the reference later
  emits it UNQUOTED in the FTS expression (db_sqlite.py:125-126), and
  FTS5's implicit AND binds tighter than NOT, so the effective
  semantics is ``NOT (a AND b)``: only documents containing BOTH words
  are excluded (verified by live FTS5 probe). We model that as a
  conjunctive NOT group (``not_groups``);
- ``"a b"``                   -> phrase (position-adjacent, in order)
- anything else whitespace-split -> AND terms.

Extraction order matters (negated phrases before negated words before
phrases) and is preserved. Terms are tokenized with the same FTS5
tokenizer as the index, so query-side and index-side token streams
can never diverge.

``parse_websearch`` adds the Postgres backend's websearch_to_tsquery
surface (db_postgres.py:114, viewer.py:108-112): implicit AND, quoted
phrases, ``-`` negation, and infix ``OR``. OR alternatives relax the
conjunction: a document qualifies if it matches every AND term/phrase
and at least one term of each OR group; scoring is sum-of-matched-terms
BM25 either way.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from aspublic_spark.functions.tokenizer import tokenize

_NEG_PHRASE = re.compile(r'[!-]"([^"]*)"')
_NEG_WORD = re.compile(r"[!-](\w+)", re.UNICODE)
_PHRASE = re.compile(r'"([^"]*)"')


@dataclass
class ParsedQuery:
    and_terms: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    not_terms: list[str] = field(default_factory=list)
    # conjunctive NOT groups: a document is excluded iff it contains ALL
    # terms of the group (sqlite backend's negated-phrase semantics:
    # `!"a b"` -> `NOT (a AND b)` because FTS5 implicit AND binds
    # tighter than NOT, db_sqlite.py:125-126)
    not_groups: list[list[str]] = field(default_factory=list)
    # negated phrases with adjacency: excluded iff the exact phrase
    # occurs (websearch_to_tsquery's `-"a b"` -> `!(a <-> b)`)
    not_phrases: list[list[str]] = field(default_factory=list)
    # NEAR proximity groups (parse_fts5 extension): (terms, n) — the
    # doc must contain one occurrence of each DISTINCT term within a
    # single field with max(pos) - min(pos) <= n + 1 (FTS5's observable
    # NEAR semantics for single-token operands, pinned by live probes)
    nears: list[tuple[list[str], int]] = field(default_factory=list)
    # ^-anchored terms/phrases (parse_fts5 extension): each entry must
    # occur at the very START of some indexed column (FTS5 `^a`,
    # `^"a b"` — live probe: position 0 of ANY column qualifies)
    anchors: list[list[str]] = field(default_factory=list)
    # column filters (parse_fts5 extension): (column_names, exclude,
    # tokens) — FTS5 `col:term`, `{a b}:term`, `-col:term`,
    # `-{a b}:term` and their phrase forms: the term/phrase must match
    # in one of the listed columns (or, with exclude=True, in any
    # column NOT listed). Live probes: names are case-insensitive, the
    # filter binds to the NEXT phrase only, whitespace after `-`/`:`
    # is allowed, and an unknown name raises FTS5's "no such column".
    # The engine resolves names to the allowed field-ordinal SET.
    col_filters: list[tuple[tuple[str, ...], bool, list[str]]] = field(
        default_factory=list
    )
    # prefix queries (parse_fts5 extension): FTS5 ``ab*`` — the doc must
    # contain at least one token starting with the stem (probed: the
    # exact token matches too, folding applies to both sides, and the
    # star may be separated by whitespace — ``ab *`` is a prefix). The
    # engine expands each stem against the dictionary and scores it as
    # ONE virtual term (tf summed over matching tokens, df = distinct
    # matching docs), mirroring FTS5's bm25 which counts a prefix as a
    # single phrase. Stems are AND-required.
    prefixes: list[str] = field(default_factory=list)
    # negated prefixes: FTS5 ``NOT ab*`` (our ``!ab*``) — excluded iff
    # ANY token with the stem occurs
    not_prefixes: list[str] = field(default_factory=list)
    # prefix phrases: FTS5 ``"a b"*`` — (leading tokens, stem): the
    # leading tokens adjacent, followed by any token with the stem
    # (probed: '"hello wor"*' matches 'hello world')
    prefix_phrases: list[tuple[list[str], str]] = field(default_factory=list)
    # list of OR groups; each group is a list of alternative terms of
    # which at least one must match (websearch extension; empty for the
    # sqlite-style parser)
    or_groups: list[list[str]] = field(default_factory=list)
    # phrase ALTERNATIVES inside OR groups, aligned by group index with
    # ``or_groups``: group i is satisfied by any term of or_groups[i] OR
    # any ADJACENT occurrence of a phrase in or_phrase_groups[i] —
    # websearch_to_tsquery keeps `<->` adjacency inside OR
    # (db_postgres.py:114), so `"a b" OR c` must not match a doc that
    # has a and b non-adjacently and lacks c
    or_phrase_groups: list[list[list[str]]] = field(default_factory=list)

    def or_operands(self) -> list[tuple[list[str], list[list[str]]]]:
        """(term_alternatives, phrase_alternatives) per OR group, padded
        so the two aligned lists can differ in length."""
        n = max(len(self.or_groups), len(self.or_phrase_groups))
        return [
            (
                self.or_groups[i] if i < len(self.or_groups) else [],
                self.or_phrase_groups[i] if i < len(self.or_phrase_groups) else [],
            )
            for i in range(n)
        ]

    @property
    def positive_terms(self) -> list[str]:
        """All distinct scoring terms, in first-appearance order."""
        seen: dict[str, None] = {}
        for t in self.and_terms:
            seen.setdefault(t)
        for ph in self.phrases:
            for t in ph:
                seen.setdefault(t)
        for tg, _n in self.nears:
            for t in tg:
                seen.setdefault(t)
        for ph in self.anchors:
            for t in ph:
                seen.setdefault(t)
        for _cols, _neg, toks in self.col_filters:
            for t in toks:
                seen.setdefault(t)
        for lead, _s in self.prefix_phrases:
            # leading tokens are ordinary scoring terms; the stem is a
            # VIRTUAL term the engine expands (never a dictionary key)
            for t in lead:
                seen.setdefault(t)
        for g in self.or_groups:
            for t in g:
                seen.setdefault(t)
        for g in self.or_phrase_groups:
            for ph in g:
                for t in ph:
                    seen.setdefault(t)
        return list(seen)

    def is_empty(self) -> bool:
        return not (
            self.and_terms
            or self.phrases
            or self.nears
            or self.anchors
            or self.col_filters
            or self.prefixes
            or self.prefix_phrases
            or self.or_groups
            or self.or_phrase_groups
        )


def _tok1(word: str) -> list[str]:
    return tokenize(word)


def parse_query(q: str, tok=tokenize) -> ParsedQuery:
    """sqlite-backend semantics (viewer.py:62-84 behavior).

    ``tok``: the analyzer used for query terms — MUST match the
    index-side analyzer (the engine passes its index's)."""
    out = ParsedQuery()
    rest = q or ""

    def neg_phrase(m: re.Match) -> str:
        toks = tok(m.group(1))
        if len(toks) == 1:
            out.not_terms.extend(toks)
        elif toks:
            out.not_groups.append(toks)  # NOT (a AND b): FTS5 precedence
        return " "

    def neg_word(m: re.Match) -> str:
        out.not_terms.extend(tok(m.group(1)))
        return " "

    def phrase(m: re.Match) -> str:
        toks = tok(m.group(1))
        if toks:
            out.phrases.append(toks)
        return " "

    rest = _NEG_PHRASE.sub(neg_phrase, rest)
    rest = _NEG_WORD.sub(neg_word, rest)
    rest = _PHRASE.sub(phrase, rest)
    for w in rest.split():
        out.and_terms.extend(tok(w))
    return out


def parse_websearch(q: str, tok=tokenize) -> ParsedQuery:
    """websearch_to_tsquery-style semantics with OR support."""
    out = ParsedQuery()
    # lex: quoted phrases, negations, OR, words
    token_re = re.compile(r'-"([^"]*)"|"([^"]*)"|(\S+)')
    items: list[tuple[str, object]] = []  # (kind, payload)
    for m in token_re.finditer(q or ""):
        if m.group(1) is not None:
            toks = tok(m.group(1))
            if toks:
                items.append(("not_phrase", toks))
        elif m.group(2) is not None:
            toks = tok(m.group(2))
            if toks:
                items.append(("phrase", toks))
        else:
            w = m.group(3)
            if w == "OR":
                items.append(("or", None))
            elif w.startswith("-") and len(w) > 1:
                items.append(("not", tok(w[1:])))
            else:
                toks = tok(w)
                if toks:
                    items.append(("word", toks))

    i = 0
    while i < len(items):
        kind, payload = items[i]
        if kind == "not":
            out.not_terms.extend(payload)
        elif kind == "not_phrase":
            if len(payload) == 1:
                out.not_terms.extend(payload)
            else:
                out.not_phrases.append(payload)  # !(a <-> b), adjacency
        elif kind in ("phrase", "word"):
            # gather an OR chain; operands may be words or phrases. A
            # phrase operand keeps its ADJACENCY requirement (matching
            # websearch_to_tsquery's `a <-> b` inside OR,
            # db_postgres.py:114); a single-token phrase is just a term.
            operands = [(kind, payload)]
            j = i
            while j + 2 < len(items) and items[j + 1][0] == "or" and items[j + 2][0] in ("word", "phrase"):
                operands.append(items[j + 2])
                j += 2
            if j > i:
                terms: list[str] = []
                phrases: list[list[str]] = []
                for k2, p in operands:
                    if k2 == "phrase" and len(p) > 1:
                        phrases.append(p)
                    else:
                        terms.extend(p)
                out.or_groups.append(terms)
                out.or_phrase_groups.append(phrases)
                i = j
            elif kind == "phrase":
                out.phrases.append(payload)
            else:
                out.and_terms.extend(payload)
        i += 1
    return out


_NEAR_GROUP = re.compile(r"NEAR\(\s*([^(),]*?)\s*(?:,\s*(\d+)\s*)?\)")
_ANCHOR_PHRASE = re.compile(r'\^"([^"]*)"')
_ANCHOR_WORD = re.compile(r"\^(\w+)", re.UNICODE)
_COL_PHRASE = re.compile(r'([!-]?)\s*(\w+)\s*:\s*"([^"]*)"')
_COL_WORD = re.compile(r"([!-]?)\s*(\w+)\s*:\s*(\w+)", re.UNICODE)
# column SETS: `{a b}:term` (match in any listed column) and the
# exclusion forms `-col:` / `-{a b}:` (match in any column NOT listed)
_COL_SET_PHRASE = re.compile(r'([!-]?)\s*\{([^{}]*)\}\s*:\s*"([^"]*)"')
_COL_SET_WORD = re.compile(r"([!-]?)\s*\{([^{}]*)\}\s*:\s*(\w+)", re.UNICODE)
# FTS5 prefix forms (probed: the star may be whitespace-separated from
# its operand — `ab *` and `"a b" *` are prefixes; a star INSIDE quotes
# is dropped by the tokenizer, i.e. `"ab*"` is the plain term `ab`)
_NEG_PREFIX = re.compile(r"[!-](\w+)\s*\*", re.UNICODE)
_PHRASE_PREFIX = re.compile(r'"([^"]*)"\s*\*')
_WORD_PREFIX = re.compile(r"(\w+)\s*\*", re.UNICODE)


def parse_fts5(q: str, tok=tokenize) -> ParsedQuery:
    """Raw-FTS5 surface extension: ``parse_query`` plus ``NEAR(...)``
    proximity groups and ``^``-anchored terms/phrases.

    The reference's sqlite backend hands its MATCH string straight to
    FTS5 (db_sqlite.py:131), whose query language includes proximity
    groups — ``NEAR(a b c, 5)``, ``NEAR(a b)`` (default n=10). This
    parser accepts that operator on top of the translateSearchString
    semantics; everything outside NEAR(...) parses exactly like
    ``parse_query`` (so NOT/phrases compose: ``NEAR(a b, 3) !c``).
    The keyword is case-sensitive like FTS5's (lowercase ``near(`` is
    ordinary text). NEAR operands are single tokens (FTS5 also allows
    quoted phrases inside NEAR; unsupported here — a quoted operand
    tokenizes to its words, i.e. it degrades to the unquoted form).
    Matching semantics are pinned by live FTS5 probes in the tests:
    duplicate operands collapse, a single-operand NEAR is a plain
    term, and the window test is max(pos)-min(pos) <= n+1 over one
    occurrence per distinct term within one field.

    ``^term`` / ``^"a b"`` require the term/phrase at the very start
    of some indexed column (probed: position 0 of ANY column
    qualifies); the anchored terms still score like ordinary query
    terms, exactly as FTS5's bm25 does.

    ``col:term`` / ``col:"a b"`` restrict the term/phrase to one
    indexed column; ``{a b}:term`` to any LISTED column; ``-col:`` /
    ``-{a b}:`` to any column NOT listed (probed: names are
    case-insensitive, the filter binds to the next phrase only,
    whitespace after ``-``/``:`` is allowed; an unknown name raises
    FTS5's "no such column"). ``!col:`` (our NOT spelling) and
    column-filtered NEAR are NOT supported and raise rather than
    silently misparse.

    ``ab*`` is an FTS5 prefix query (any token starting with the stem;
    probed: the exact token matches, the star may be whitespace-
    separated, a star inside quotes is tokenizer-dropped so ``"ab*"``
    is the plain term ``ab``). ``!ab*`` excludes docs with any such
    token; ``"a b"*`` requires the leading tokens adjacent followed by
    a stem match. Anchored prefixes (``^a*``), column-filtered
    prefixes (``col:a*``), prefixes inside NEAR, negated prefix
    phrases (``!"a b"*``) and a leading/bare star raise rather than
    silently misparse (FTS5 itself errors on a bare star)."""
    out = ParsedQuery()
    rest = q or ""

    def near(m: re.Match) -> str:
        toks = tok(m.group(1))
        n = int(m.group(2)) if m.group(2) is not None else 10
        # positions are capped at 2^24 (engine key packing), so any
        # larger window is equivalent to unlimited; the clamp also keeps
        # the matcher's int64 window arithmetic overflow-free
        n = min(n, 1 << 24)
        uniq = list(dict.fromkeys(toks))
        if len(uniq) >= 2:
            out.nears.append((uniq, n))
        elif uniq:
            out.and_terms.extend(uniq)  # NEAR(a, n) == a (probed)
        return " "

    def anchor(m: re.Match) -> str:
        toks = tok(m.group(1))
        if toks:
            out.anchors.append(toks)
        return " "

    def _col_entry(neg_mark: str, names_raw: list[str], content: str) -> str:
        if neg_mark == "!":
            # `!` is OUR NOT spelling; FTS5's column exclusion is `-`.
            # Refusing keeps `!col:x` from silently meaning either one.
            raise ValueError("use -col: for column exclusion, not !col:")
        names = tuple(n.lower() for n in names_raw if n)
        if not names:
            raise ValueError("malformed column filter: empty column set")
        toks = tok(content)
        if toks:
            out.col_filters.append((names, neg_mark == "-", toks))
        return " "

    def col_filter(m: re.Match) -> str:
        return _col_entry(m.group(1), [m.group(2)], m.group(3))

    def col_set_filter(m: re.Match) -> str:
        return _col_entry(m.group(1), m.group(2).split(), m.group(3))

    def neg_prefix(m: re.Match) -> str:
        toks = tok(m.group(1))
        if toks:
            out.not_prefixes.append(toks[-1])
            out.not_terms.extend(toks[:-1])
        return " "

    def phrase_prefix(m: re.Match) -> str:
        toks = tok(m.group(1))
        if len(toks) >= 2:
            out.prefix_phrases.append((toks[:-1], toks[-1]))
        elif toks:
            out.prefixes.append(toks[0])  # "ab"* == ab* (probed)
        return " "

    def word_prefix(m: re.Match) -> str:
        toks = tok(m.group(1))
        if toks:
            out.prefixes.append(toks[-1])
            out.and_terms.extend(toks[:-1])
        return " "

    if re.search(r"(\w+|\{[^{}]*\})\s*:\s*NEAR\(", rest):
        raise ValueError("column-filtered NEAR(...) is not supported")
    if re.search(r"NEAR\([^)]*\*", rest):
        raise ValueError("prefix operands inside NEAR(...) are not supported")
    if re.search(r'\^\s*(\w+|"[^"]*")\s*\*', rest):
        raise ValueError("anchored prefix (^a*) is not supported")
    if re.search(r'(\w+|\{[^{}]*\})\s*:\s*(\w+|"[^"]*")\s*\*', rest):
        raise ValueError("column-filtered prefix (col:a*) is not supported")
    if re.search(r'[!-]\s*"[^"]*"\s*\*', rest):
        raise ValueError("negated prefix phrase (!\"a b\"*) is not supported")
    rest = _COL_SET_PHRASE.sub(col_set_filter, rest)
    rest = _COL_SET_WORD.sub(col_set_filter, rest)
    rest = _COL_PHRASE.sub(col_filter, rest)
    rest = _COL_WORD.sub(col_filter, rest)
    rest = _NEAR_GROUP.sub(near, rest)
    rest = _ANCHOR_PHRASE.sub(anchor, rest)
    rest = _ANCHOR_WORD.sub(anchor, rest)
    rest = _PHRASE_PREFIX.sub(phrase_prefix, rest)
    # stars INSIDE quoted phrases are dropped by the tokenizer (probed:
    # `"ab*"` is the plain term `ab`), so the word-prefix and bare-star
    # passes only see the segments OUTSIDE quotes
    segs = re.split(r'("[^"]*")', rest)
    for i, seg in enumerate(segs):
        if seg.startswith('"'):
            continue
        seg = _NEG_PREFIX.sub(neg_prefix, seg)
        seg = _WORD_PREFIX.sub(word_prefix, seg)
        if "*" in seg:
            # FTS5 errors on a bare/leading star ("unknown special query")
            raise ValueError("unknown special query: *")
        segs[i] = seg
    rest = "".join(segs)
    base = parse_query(rest, tok=tok)
    base.nears = out.nears
    base.anchors = out.anchors
    base.col_filters = out.col_filters
    base.prefixes = list(dict.fromkeys(out.prefixes))
    base.not_prefixes = list(dict.fromkeys(out.not_prefixes))
    base.prefix_phrases = out.prefix_phrases
    base.and_terms = out.and_terms + base.and_terms
    base.not_terms = out.not_terms + base.not_terms
    return base
