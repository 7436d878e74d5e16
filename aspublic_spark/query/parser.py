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


@dataclass(frozen=True)
class Node:
    """One node of a raw-FTS5 boolean expression tree (``parse_fts5``).

    Produced only when the query's boolean structure cannot be lowered
    into the flat :class:`ParsedQuery` shape (e.g. ``a OR (b NOT c)``,
    ``NEAR(a b) OR c``, ``text:(x OR y)``); the engine then evaluates
    the tree generically. Kinds:

    - ``term``/``phrase``/``anchor``: ``toks`` holds the tokens
    - ``near``: ``toks`` + window ``n``
    - ``prefix``: ``stem``; ``prefix_phrase``: lead ``toks`` + ``stem``
    - ``and``/``or``: ``kids``; ``not``: binary FTS5 NOT, ``kids=(l, r)``
    - ``unot``: unary hybrid negation (our ``!x`` spelling), one kid
    - ``col``: column filter applied to ``kids[0]``; ``spec`` is
      ``(names, exclude)`` — nested ``col`` nodes intersect (probed:
      ``text:(subject:a)`` matches nothing on disjoint columns)
    - ``false``/``true``: constants introduced by simplification
    """

    kind: str
    kids: tuple = ()
    toks: tuple = ()
    n: int = 0
    stem: str = ""
    spec: tuple = ()

    def describe(self) -> str:
        """Compact s-expression of the tree (debug echo + tests)."""
        def _slot(sl) -> str:
            return sl if isinstance(sl, str) else sl[1] + "*"

        k = self.kind
        if k == "term":
            return self.toks[0]
        if k == "phrase":
            return '"' + " ".join(_slot(sl) for sl in self.toks) + '"'
        if k == "anchor":
            return '^"' + " ".join(_slot(sl) for sl in self.toks) + '"'
        if k == "near":
            ops = " ".join(
                _slot(op[0]) if len(op) == 1
                else '"' + " ".join(_slot(sl) for sl in op) + '"'
                for op in self.toks
            )
            return f"(near:{self.n} {ops})"
        if k == "prefix":
            return self.stem + "*"
        if k == "prefix_phrase":
            return '"' + " ".join(self.toks) + f' {self.stem}*"'
        if k == "col":
            names, exclude = self.spec
            tag = ("-" if exclude else "") + (
                names[0] if len(names) == 1 else "{" + " ".join(names) + "}"
            )
            return f"({tag}: {self.kids[0].describe()})"
        if k in ("true", "false"):
            return k
        return f"({k} {' '.join(c.describe() for c in self.kids)})"


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
    # raw-FTS5 boolean expression tree (parse_fts5 extension): set ONLY
    # when the query's boolean structure cannot be expressed by the
    # flat fields above (e.g. `a OR (b NOT c)`, `NEAR(a b) OR c`,
    # `text:(x OR y)`). When set, every flat field is empty and the
    # engine evaluates the tree generically.
    tree: "Node | None" = None
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
        return self.tree is None and not (
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


# Raw-FTS5 scanner. Alternative ORDER is load-bearing: keywords and
# NEAR before plain words; column specs (colon required) before the
# hybrid !/- negations; phrases before words. Anything no alternative
# claims is separator junk the FTS5 tokenizer drops anyway. Keywords
# are exact-uppercase like FTS5's (probed: `a NoT b` is three phrases).
_FTS5_TOKENS = [
    ("ws", re.compile(r"\s+")),
    ("lp", re.compile(r"\(")),
    ("rp", re.compile(r"\)")),
    ("kw", re.compile(r"(AND|OR|NOT)(?!\w)")),
    # probed: whitespace between NEAR and ( is valid FTS5
    ("near", re.compile(r"NEAR\s*\(\s*([^(),]*?)\s*(?:,\s*(\d+)\s*)?\)")),
    ("colset", re.compile(r"([!-]?)\s*\{([^{}]*)\}\s*:")),
    ("col", re.compile(r"([!-]?)\s*(\w+)\s*:", re.UNICODE)),
    ("aphrase", re.compile(r'\^"([^"]*)"(\s*\*)?')),
    ("nphrase", re.compile(r'[!-]"([^"]*)"(\s*\*)?')),
    # probed FTS5 prefix forms: the star may be whitespace-separated
    # (`ab *`, `"a b" *`); a star INSIDE quotes is tokenizer-dropped
    ("phrase", re.compile(r'"([^"]*)"(\s*\*)?')),
    ("nword", re.compile(r"[!-](\w+)(\s*\*)?", re.UNICODE)),
    ("aword", re.compile(r"\^(\w+)(\s*\*)?", re.UNICODE)),
    ("word", re.compile(r"(\w+)(\s*\*)?", re.UNICODE)),
    ("star", re.compile(r"\*")),
    # FTS5 phrase concatenation: `a + b` is the PHRASE "a b" (probed:
    # binds tightest, whitespace-insensitive, composes with anchors /
    # column filters / a trailing prefix star; dangling forms error)
    ("plus", re.compile(r"\+")),
    ("junk", re.compile(r".", re.DOTALL)),
]

# NEAR(...) content: quoted phrase operands, single-token operands,
# `+` concatenation between them (probed: NEAR("one" + "two" x, 1) is
# the two operands [one two] and [x]) and prefix stars — attached,
# whitespace-detached, or on a quoted phrase (probed: NEAR(tw* one),
# NEAR(tw * one) and NEAR("x tw"* one) are all valid FTS5)
_NEAR_OPERAND = re.compile(r'"([^"]*)"(\s*\*)?|(\+)|(\*)|([^\s"*+]+)(\*)?')


def _near_operands(content: str, tok) -> list[tuple]:
    """Parse a NEAR group's operand list into phrase slot tuples (a
    slot is a plain token or a ``("*", stem)`` prefix marker). A quoted
    chunk is ONE operand (its tokens adjacent); an unquoted chunk's
    tokens are SEPARATE single-token operands (legacy behavior,
    pinned); ``+`` concatenates the two adjacent operands; a star
    marks the PREVIOUS slot as a prefix. Duplicate operands collapse
    (probed)."""
    ops: list[tuple] = []
    pending = False

    def star_last():
        if not ops or not ops[-1] or isinstance(ops[-1][-1], tuple):
            raise ValueError("fts5 syntax error near * (inside NEAR)")
        ops[-1] = ops[-1][:-1] + (("*", ops[-1][-1]),)

    for m in _NEAR_OPERAND.finditer(content):
        if m.group(3):
            if not ops or pending:
                raise ValueError("fts5 syntax error near + (inside NEAR)")
            pending = True
            continue
        if m.group(4):
            star_last()
            continue
        if m.group(1) is not None:
            toks = tok(m.group(1))
            units = [tuple(toks)] if toks else []
            starred = bool(m.group(2))
        else:
            toks = tok(m.group(5))
            units = [(t,) for t in toks]
            starred = bool(m.group(6))
        for u in units:
            if pending:
                ops[-1] = ops[-1] + u
                pending = False
            else:
                ops.append(u)
        if starred and units:
            star_last()
    if pending:
        raise ValueError("fts5 syntax error near + (inside NEAR)")
    return list(dict.fromkeys(ops))


def _scan_fts5(q: str, tok) -> list[tuple]:
    """Lex a raw-FTS5 query into tokens: ``("lp",)``, ``("rp",)``,
    ``("kw", name)``, ``("colspec", (names, exclude))``, and
    ``("unit", Node)`` leaves (words/phrases/NEAR/anchors/prefixes,
    hybrid ``!``/``-`` negations as ``unot`` nodes). One source word
    may emit several unit tokens when the analyzer splits it."""
    out: list[tuple] = []
    i, n = 0, len(q)
    while i < n:
        for name, rx in _FTS5_TOKENS:
            m = rx.match(q, i)
            if not m:
                continue
            i = m.end()
            if name in ("ws", "junk"):
                break
            if name == "lp" or name == "rp":
                out.append((name,))
                break
            if name == "kw":
                out.append(("kw", m.group(1)))
                break
            if name == "near":
                content = m.group(1)
                nn = int(m.group(2)) if m.group(2) is not None else 10
                # positions cap at 2^24 (engine key packing): larger
                # windows are equivalent to unlimited and the clamp
                # keeps the matcher's int64 arithmetic overflow-free
                nn = min(nn, 1 << 24)
                # operands are PHRASES (quoted chunks stay one operand;
                # duplicates collapse — probed); all-single-token groups
                # keep the flat plan, phrase operands ride the tree
                ops = _near_operands(content, tok)
                if len(ops) >= 2:
                    out.append(("unit", Node("near", toks=tuple(ops), n=nn)))
                elif ops:
                    # NEAR(p, n) == p (probed): term / phrase / prefix
                    out.append(("unit", _slots_node("phrase", list(ops[0]))))
                break
            if name in ("colset", "col"):
                neg = m.group(1)
                if neg == "!":
                    # `!` is OUR NOT spelling; FTS5's column exclusion
                    # is `-`. Refusing keeps `!col:x` from silently
                    # meaning either one.
                    raise ValueError("use -col: for column exclusion, not !col:")
                names = tuple(
                    s.lower()
                    for s in (m.group(2).split() if name == "colset" else [m.group(2)])
                    if s
                )
                if not names:
                    raise ValueError("malformed column filter: empty column set")
                out.append(("colspec", (names, neg == "-")))
                break
            if name == "aphrase" or name == "aword":
                toks = tok(m.group(1))
                if toks:
                    slots = list(toks)
                    if m.group(2):
                        # anchored prefix `^a*` / `^"a b"*` (probed
                        # valid FTS5): the last slot is a stem marker
                        slots[-1] = ("*", slots[-1])
                    out.append(("unit", Node("anchor", toks=tuple(slots))))
                break
            if name == "nphrase":
                if m.group(2):
                    raise ValueError(
                        'negated prefix phrase (!"a b"*) is not supported'
                    )
                toks = tok(m.group(1))
                if len(toks) == 1:
                    out.append(("unit", Node("unot", kids=(Node("term", toks=(toks[0],)),))))
                elif toks:
                    # translateSearchString semantics for OUR `!"a b"`
                    # spelling: conjunctive NOT (a AND b) — the
                    # reference emits negated phrases unquoted
                    # (db_sqlite.py:125-126). The keyword form
                    # `NOT "a b"` keeps adjacency instead (probed).
                    grp = Node("and", kids=tuple(Node("term", toks=(t,)) for t in toks))
                    out.append(("unit", Node("unot", kids=(grp,))))
                break
            if name == "phrase":
                toks = tok(m.group(1))
                if m.group(2):
                    if len(toks) >= 2:
                        out.append(
                            ("unit", Node("prefix_phrase", toks=tuple(toks[:-1]), stem=toks[-1]))
                        )
                    elif toks:  # "ab"* == ab* (probed)
                        out.append(("unit", Node("prefix", stem=toks[0])))
                elif toks:
                    out.append(("unit", Node("phrase", toks=tuple(toks))))
                break
            if name == "nword":
                toks = tok(m.group(1))
                kids: list[Node] = [Node("term", toks=(t,)) for t in toks]
                if m.group(2):
                    if not toks:
                        break
                    kids[-1] = Node("prefix", stem=toks[-1])
                if len(kids) == 1:
                    out.append(("unit", Node("unot", kids=(kids[0],))))
                elif kids:
                    # `!a_b` excluded any-of (extraction-order compat):
                    # NOT (a OR b) == exclude docs with a or with b
                    out.append(("unit", Node("unot", kids=(Node("or", kids=tuple(kids)),))))
                break
            if name == "word":
                toks = tok(m.group(1))
                if m.group(2):
                    if not toks:
                        break
                    for t in toks[:-1]:
                        out.append(("unit", Node("term", toks=(t,))))
                    out.append(("unit", Node("prefix", stem=toks[-1])))
                else:
                    for t in toks:
                        out.append(("unit", Node("term", toks=(t,))))
                break
            if name == "plus":
                out.append(("plus",))
                break
            if name == "star":
                # FTS5 errors on a bare/leading star
                raise ValueError("unknown special query: *")
    return _merge_plus(out)


def _unit_slots(nd: Node) -> list:
    """A phrase unit's slot list: plain tokens and ``("*", stem)``
    prefix markers. Only phrase-like units concatenate."""
    if nd.kind in ("term", "phrase", "anchor"):
        return list(nd.toks)
    if nd.kind == "prefix":
        return [("*", nd.stem)]
    if nd.kind == "prefix_phrase":
        return list(nd.toks) + [("*", nd.stem)]
    raise ValueError("fts5 syntax error near +")


def _slots_node(kind: str, slots: list) -> Node:
    """Normalize a slot list into the most specific node: plain slots
    -> term/phrase; a single TRAILING marker -> prefix/prefix_phrase
    (flat-lowerable); markers anywhere else stay marker slots on a
    phrase/anchor node (boolean-tree path — probed valid FTS5:
    ``tw* + one``, ``^tw*``, ``NEAR(tw* one, 2)``)."""
    marks = [i for i, sl in enumerate(slots) if isinstance(sl, tuple)]
    if kind == "phrase":
        if not marks:
            if len(slots) == 1:
                return Node("term", toks=(slots[0],))
            return Node("phrase", toks=tuple(slots))
        if marks == [len(slots) - 1]:
            if len(slots) == 1:
                return Node("prefix", stem=slots[0][1])
            return Node(
                "prefix_phrase", toks=tuple(slots[:-1]), stem=slots[-1][1]
            )
    return Node(kind, toks=tuple(slots))


def _concat_units(left: Node, right: Node) -> Node:
    """FTS5 ``+`` concatenation of two phrase units (probed: the result
    is ONE phrase; an anchored left keeps its anchor over the whole
    phrase; prefix slots may land ANYWHERE — ``tw* + one`` is the
    phrase [tw-stem, one]; negations and NEAR groups raise like FTS5's
    syntax errors)."""
    if right.kind == "anchor":
        raise ValueError("fts5 syntax error near + (misplaced ^)")
    kind = "anchor" if left.kind == "anchor" else "phrase"
    return _slots_node(kind, _unit_slots(left) + _unit_slots(right))


def _merge_plus(toks: list[tuple]) -> list[tuple]:
    """Fold ``+`` concatenations in the scanned token stream: each
    ``plus`` must sit between two phrase UNITS (probed: `+ a`, `a +`,
    `a ++ b`, `a + (x)`, `a + col:x`, `a + OR` are all FTS5 syntax
    errors)."""
    out: list[tuple] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t[0] != "plus":
            out.append(t)
            i += 1
            continue
        if not out or out[-1][0] != "unit":
            raise ValueError("fts5 syntax error near +")
        if i + 1 >= len(toks) or toks[i + 1][0] != "unit":
            raise ValueError("fts5 syntax error near +")
        out[-1] = ("unit", _concat_units(out[-1][1], toks[i + 1][1]))
        i += 2
    return out


class _TS:
    def __init__(self, toks: list[tuple]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t


def _merge(kind: str, a: Node, b: Node) -> Node:
    ka = a.kids if a.kind == kind else (a,)
    kb = b.kids if b.kind == kind else (b,)
    return Node(kind, kids=ka + kb)


def _parse_or(ts: _TS) -> Node | None:
    node = _parse_and(ts)
    while (t := ts.peek()) and t[0] == "kw" and t[1] == "OR":
        if node is None:
            raise ValueError("fts5 syntax error near OR")
        ts.next()
        rhs = _parse_and(ts)
        if rhs is None:
            raise ValueError("fts5 syntax error: dangling OR")
        node = _merge("or", node, rhs)
    return node


def _parse_and(ts: _TS) -> Node | None:
    node = _parse_not(ts)
    while (t := ts.peek()) and t[0] == "kw" and t[1] == "AND":
        if node is None:
            raise ValueError("fts5 syntax error near AND")
        ts.next()
        rhs = _parse_not(ts)
        if rhs is None:
            raise ValueError("fts5 syntax error: dangling AND")
        node = _merge("and", node, rhs)
    return node


def _parse_not(ts: _TS) -> Node | None:
    node = _parse_item(ts)
    while (t := ts.peek()) and t[0] == "kw" and t[1] == "NOT":
        if node is None:
            raise ValueError("fts5 syntax error near NOT")
        ts.next()
        rhs = _parse_item(ts)
        if rhs is None:
            raise ValueError("fts5 syntax error: dangling NOT")
        node = Node("not", kids=(node, rhs))
    return node


def _parse_item(ts: _TS) -> Node | None:
    """One juxtaposition chain (implicit AND — binds tighter than NOT,
    probed: ``a NOT b c`` == ``a NOT (b AND c)``). TOLERANT superset of
    FTS5: parens may appear in a chain (FTS5 errors there), so legacy
    inputs like ``near(a b)`` keep parsing as plain terms."""
    members: list[Node] = []
    while True:
        t = ts.peek()
        if t is None or t[0] in ("rp", "kw"):
            break
        if t[0] == "lp":
            ts.next()
            sub = _parse_or(ts)
            nxt = ts.peek()
            if nxt and nxt[0] == "rp":
                ts.next()
            if sub is not None:
                members.append(sub)
        elif t[0] == "colspec":
            ts.next()
            node = _parse_col_target(ts, t[1])
            if node is not None:
                members.append(node)
        else:  # unit
            ts.next()
            members.append(t[1])
    if not members:
        return None
    return members[0] if len(members) == 1 else Node("and", kids=tuple(members))


def _parse_col_target(ts: _TS, spec: tuple) -> Node | None:
    """The column filter binds to the NEXT unit or parenthesized
    expression only (probed); nested colspecs INTERSECT (probed:
    ``text:(subject:a)`` matches nothing on disjoint columns)."""
    t = ts.peek()
    if t is None or t[0] == "rp":
        # dangling colspec: degrade the name(s) to plain terms (the
        # legacy regexes never recognized a content-less filter)
        return Node(
            "and", kids=tuple(Node("term", toks=(nm,)) for nm in spec[0])
        ) if len(spec[0]) > 1 else Node("term", toks=(spec[0][0],))
    if t[0] == "kw":
        # legacy tolerance: a keyword right after a colspec is content
        # (`text: OR` was the column filter (text, [or]))
        ts.next()
        target: Node | None = Node("term", toks=(t[1].lower(),))
    elif t[0] == "lp":
        ts.next()
        target = _parse_or(ts)
        nxt = ts.peek()
        if nxt and nxt[0] == "rp":
            ts.next()
        if target is None:
            return None
    elif t[0] == "colspec":
        ts.next()
        target = _parse_col_target(ts, t[1])
        if target is None:
            return None
    else:
        ts.next()
        target = t[1]
    return Node("col", kids=(target,), spec=spec)


# ------------------------------------------------------- flat lowering
def _lower_top(node: Node, pq: ParsedQuery) -> bool:
    """Lower an AND-level tree into the flat ParsedQuery fields;
    False = not flat-expressible (the caller keeps the tree)."""
    members = node.kids if node.kind == "and" else (node,)
    for m in members:
        k = m.kind
        if k == "term":
            pq.and_terms.extend(m.toks)
        elif k == "phrase":
            if any(isinstance(sl, tuple) for sl in m.toks):
                return False  # mid-phrase prefix slots: tree path
            pq.phrases.append(list(m.toks))
        elif k == "near":
            if any(
                len(op) > 1 or isinstance(op[0], tuple) for op in m.toks
            ):
                return False  # phrase/prefix operands: tree path
            pq.nears.append(([op[0] for op in m.toks], m.n))
        elif k == "anchor":
            if any(isinstance(sl, tuple) for sl in m.toks):
                return False  # anchored prefix slots: tree path
            pq.anchors.append(list(m.toks))
        elif k == "prefix":
            if m.stem not in pq.prefixes:
                pq.prefixes.append(m.stem)
        elif k == "prefix_phrase":
            pq.prefix_phrases.append((list(m.toks), m.stem))
        elif k == "col":
            kid = m.kids[0]
            if kid.kind in ("term", "phrase"):
                pq.col_filters.append((m.spec[0], m.spec[1], list(kid.toks)))
            else:  # col over NEAR/prefix/anchor/boolean -> tree path
                return False
        elif k == "and":  # nested chain groups: AND is associative
            if not _lower_top(m, pq):
                return False
        elif k == "unot":
            if not _lower_unot(m.kids[0], pq):
                return False
        elif k == "or":
            if not _lower_or(m, pq):
                return False
        elif k == "not":
            if not _lower_top(m.kids[0], pq):
                return False
            if not _lower_not_right(m.kids[1], pq):
                return False
        else:
            return False
    return True


def _lower_unot(kid: Node, pq: ParsedQuery) -> bool:
    """Hybrid `!x`/-x negations: exclusion semantics follow the legacy
    extraction (disjunctive across split tokens, conjunctive for
    negated quoted phrases)."""
    if kid.kind == "term":
        pq.not_terms.extend(kid.toks)
        return True
    if kid.kind == "prefix":
        if kid.stem not in pq.not_prefixes:
            pq.not_prefixes.append(kid.stem)
        return True
    if kid.kind == "or":
        return all(_lower_unot(op, pq) for op in kid.kids)
    if kid.kind == "and":
        if not all(op.kind == "term" for op in kid.kids):
            return False
        grp = [t for op in kid.kids for t in op.toks]
        if len(grp) == 1:
            pq.not_terms.extend(grp)
        else:
            pq.not_groups.append(grp)  # NOT (a AND b): FTS5 precedence
        return True
    return False


def _lower_or(m: Node, pq: ParsedQuery) -> bool:
    terms: list[str] = []
    phrs: list[list[str]] = []
    for op in m.kids:
        if op.kind == "term":
            terms.extend(op.toks)
        elif op.kind == "phrase":
            if any(isinstance(sl, tuple) for sl in op.toks):
                return False  # prefix slots: tree path
            if len(op.toks) == 1:
                terms.extend(op.toks)
            else:
                phrs.append(list(op.toks))  # adjacency kept inside OR
        else:
            return False
    pq.or_groups.append(terms)
    pq.or_phrase_groups.append(phrs)
    return True


def _lower_not_right(r: Node, pq: ParsedQuery) -> bool:
    """Right operand of the FTS5 binary NOT. The keyword form keeps
    phrase ADJACENCY (probed: `x NOT "b c"` keeps docs with b..c apart),
    unlike our legacy `!"b c"` spelling."""
    if r.kind == "term":
        pq.not_terms.extend(r.toks)
        return True
    if r.kind == "phrase":
        if any(isinstance(sl, tuple) for sl in r.toks):
            return False  # prefix slots: tree path
        if len(r.toks) == 1:
            pq.not_terms.extend(r.toks)
        else:
            pq.not_phrases.append(list(r.toks))
        return True
    if r.kind == "prefix":
        if r.stem not in pq.not_prefixes:
            pq.not_prefixes.append(r.stem)
        return True
    if r.kind == "and":
        if not all(op.kind == "term" for op in r.kids):
            return False
        grp = [t for op in r.kids for t in op.toks]
        if len(grp) == 1:
            pq.not_terms.extend(grp)
        else:
            pq.not_groups.append(grp)
        return True
    if r.kind == "or":
        # NOT (x OR y) == NOT x AND NOT y: lower each operand
        return all(_lower_not_right(op, pq) for op in r.kids)
    return False


def parse_fts5(q: str, tok=tokenize) -> ParsedQuery:
    """Raw-FTS5 surface: the full boolean query language the reference's
    sqlite backend hands straight to FTS5 (db_sqlite.py:131), plus the
    legacy ``!``/``-`` negation spellings of ``parse_query``.

    Grammar, pinned by live FTS5 probes (tests): precedence from
    tightest to loosest is juxtaposition (implicit AND) > ``NOT`` >
    ``AND`` > ``OR``, all left-associative — so ``a NOT b c`` is
    ``a NOT (b AND c)`` while ``a NOT b AND c`` is ``(a NOT b) AND c``,
    and ``a OR b c`` is ``a OR (b AND c)``. Keywords are exact-
    uppercase (lowercase spellings are plain terms). Parentheses group
    arbitrarily; FTS5 itself refuses juxtaposed parens (``(a) (b)`` is
    a syntax error there) — we tolerate them as implicit AND so legacy
    inputs like ``near(a b)`` keep parsing as plain terms. Dangling
    binary operators raise like FTS5's syntax errors.

    Operand surface:

    - ``NEAR(a b c, 5)`` / ``NEAR(a b)`` (default n=10; whitespace
      before ``(`` allowed — probed). Operands are single tokens OR
      quoted phrases (``NEAR("a b" c, 2)``), with ``+`` concatenation
      between them. Window test: max(start) - min(end) <= n+1 over one
      occurrence INTERVAL per distinct operand in one field (pinned by
      randomized live-FTS5 differentials; reduces to the single-token
      max-min <= n+1 rule when every operand is one token).
    - ``a + b`` / ``"a b" + c`` / ``a + b*``: FTS5 phrase
      concatenation — the result is ONE phrase (binds tightest,
      composes with ``^`` anchors, column filters and a trailing
      prefix star; dangling/misplaced ``+`` raises like FTS5's syntax
      errors, including ``c++``).
    - ``^term`` / ``^"a b"``: term/phrase starts a column (position 0
      of ANY indexed column qualifies — probed).
    - ``col:x`` / ``{a b}:x`` / ``-col:x`` / ``-{a b}:x``: column
      filters (names case-insensitive; unknown name raises FTS5's
      "no such column"). The filter binds to the next phrase or
      parenthesized EXPRESSION (probed: ``text:(a OR b)`` restricts
      the whole group; nested colspecs intersect) and composes with
      NEAR/prefix/anchor operands (``text:NEAR(a b)``, ``col:a*``).
    - ``ab*`` / ``"a b"*``: prefix queries (star may be whitespace-
      separated; a star inside quotes is tokenizer-dropped).
    - legacy ``!term`` / ``-term`` (NOT term) and ``!"a b"`` —
      conjunctive NOT (a AND b), the translateSearchString quirk the
      reference ships (db_sqlite.py:125-126). The KEYWORD form
      ``NOT "a b"`` keeps phrase adjacency instead (probed).

    Prefix stars compose everywhere FTS5 accepts them (all probed):
    mid-phrase via ``+`` (``tw* + one``), anchored (``^tw*``,
    ``^"x tw"*``), and as NEAR operands (``NEAR(tw* one, 2)``,
    ``NEAR("x tw"* one, 5)``, detached stars bind the previous
    operand). Still refused (raise, never silently misparse): negated
    prefix phrases (``!"a b"*``), ``!col:``, bare ``*``.

    Queries whose boolean structure fits the flat :class:`ParsedQuery`
    model lower into it (identical plans to the pre-boolean surface);
    anything else returns ``ParsedQuery(tree=...)`` and the engine
    evaluates the expression tree generically."""
    root = None
    ts = _TS(_scan_fts5(q or "", tok))
    while ts.peek() is not None:
        before = ts.i
        sub = _parse_or(ts)
        if sub is not None:
            root = sub if root is None else _merge("and", root, sub)
        t = ts.peek()
        if t is not None and t[0] == "rp":
            ts.next()  # unmatched ')' is junk, like the FTS5 tokenizer's
        elif ts.i == before:
            ts.next()  # safety: never stall on an unparseable token
    pq = ParsedQuery()
    if root is None:
        return pq
    if _lower_top(root, pq) and not _col_conflicts(pq):
        pq.prefixes = list(dict.fromkeys(pq.prefixes))
        pq.not_prefixes = list(dict.fromkeys(pq.not_prefixes))
        return pq
    return ParsedQuery(tree=root)


def _col_conflicts(pq: ParsedQuery) -> bool:
    """True when the flat col_filters model would misrepresent the
    query: one term under two DIFFERENT filters, or both filtered and
    free (FTS5 treats those as independent phrases — probed:
    ``text:a OR subject:a``). Such queries keep the expression tree,
    whose restrictions are per-leaf."""
    spec_of: dict[str, tuple] = {}
    for names, exclude, toks in pq.col_filters:
        spec = (tuple(sorted(names)), exclude)
        for t in toks:
            if spec_of.setdefault(t, spec) != spec:
                return True
    if not spec_of:
        return False
    free = (
        set(pq.and_terms)
        | {t for ph in pq.phrases for t in ph}
        | {t for tg, _n in pq.nears for t in tg}
        | {t for ph in pq.anchors for t in ph}
        | {t for lead, _s in pq.prefix_phrases for t in lead}
        | {t for g in pq.or_groups for t in g}
        | {t for g in pq.or_phrase_groups for ph in g for t in ph}
    )
    return bool(set(spec_of) & free)
