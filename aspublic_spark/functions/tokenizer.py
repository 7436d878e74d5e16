"""FTS5-faithful tokenizer: ``unicode61 remove_diacritics 2`` semantics.

The reference's entire text-analysis surface is the FTS5 tokenizer it
configures at reference common/db_sqlite.py:27::

    tokenize="unicode61 remove_diacritics 2"

Everything downstream (postings, phrase positions, BM25 tf/df) depends
on reproducing it byte-for-byte, so the semantics here were pinned by
probing an actual FTS5 ``fts5vocab`` table (not by reading sqlite
source). Observed rules:

- token characters: Unicode general categories L*, N*, plus private-use
  (Co); combining marks (Mn/Mc/Me) are token characters too (they do
  not split a token);
- everything else (space, punctuation incl. ``_``, format chars like
  soft hyphen) separates tokens — ``foo_bar`` -> ``foo``, ``bar``;
- case: simple per-character lowercase (NOT full casefold: ``ß`` stays
  ``ß``, ``STRASSE`` -> ``strasse``, ``Ǆ/ǅ`` -> ``ǆ``);
- remove_diacritics 2: standalone combining marks (category Mn/Me) are
  dropped wherever they appear (``x́y`` -> ``xy``, Cyrillic
  ``а́`` -> ``а``, decomposed ``ガ`` -> ``カ``); precomposed
  characters are folded to their base letter only when the base is
  Latin (``å``->``a``, ``ṡ``->``s``, ``ạ``->``a``, ``ǟ``->``a``), while
  non-Latin precomposed keep their marks (``ガ``, ``ё``, ``ά``, ``й``
  unchanged) and Latin letters with non-mark modifications keep them
  (``ø``, ``ǆ`` unchanged);
- no compatibility normalization: fullwidth ``Ｆｕｌｌ`` and ligature
  ``ﬁ`` pass through (lowercased only).

Implementation: a lazily-populated per-codepoint translation table +
``str.translate`` (one C-level pass per string), then a whitespace
split. Inside the pandas UDF this is Arrow-batched; no per-row Python
at the Spark API surface (BASELINE.json input_hint).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LATIN_BASE_MAX = 0x024F  # Basic Latin .. Latin Extended-B


def _fold_codepoint(cp: int) -> str:
    ch = chr(cp)
    cat = unicodedata.category(ch)
    if not (cat[0] in "LN" or cat in ("Co", "Mn", "Mc", "Me")):
        return " "  # separator
    if cat in ("Mn", "Me"):
        return ""  # standalone combining mark: dropped (remove_diacritics 2)
    out: list[str] = []
    for lch in ch.lower():  # simple lowercase; İ -> 'i' + U+0307
        lcat = unicodedata.category(lch)
        if lcat in ("Mn", "Me"):
            continue
        if ord(lch) > 0x7F:
            d = unicodedata.normalize("NFD", lch)
            if (
                len(d) > 1
                and ord(d[0]) <= _LATIN_BASE_MAX
                and all(unicodedata.category(m) == "Mn" for m in d[1:])
            ):
                lch = d[0].lower()
        out.append(lch)
    return "".join(out)


class _FoldTable(dict):
    """Translation table for str.translate; computes entries on demand."""

    def __missing__(self, cp: int) -> str:
        r = _fold_codepoint(cp)
        self[cp] = r
        return r


_TABLE = _FoldTable()
# Pre-seed ASCII so the common path never hits __missing__.
for _cp in range(128):
    _TABLE[_cp]


def tokenize(text: str | None) -> list[str]:
    """Tokenize one string with FTS5 unicode61+remove_diacritics-2 semantics."""
    if not text:
        return []
    return text.translate(_TABLE).split()


def _tokenize_series(s: pd.Series) -> pd.Series:
    return s.map(tokenize, na_action=None)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_udf(s: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) column -> array<string> of tokens.

    Token order is position order: the array index of a token IS its
    FTS5 position (0-based), which the phrase operator relies on.
    """
    return _tokenize_series(s.fillna(""))




