"""HTML -> plain text normalization (reference I5/T7).

The reference runs every status body through ``html2text`` configured
with ``ignore_links=True`` and ``body_width=0`` before indexing
(collector.py:102 ``htmlparser.handle(s['content']).strip()``; parser
config collector.py:369-371). Reproduced here with the stdlib
HTMLParser as an Arrow-batched pandas UDF:

- anchor TEXT is kept, hrefs are dropped (ignore_links=True);
- block elements (p, div, br, li, headings, ...) become newlines,
  never wrapped (body_width=0);
- script/style contents are dropped;
- character/entity references are decoded (&amp; -> &);
- the result is ``.strip()``-ed like the reference.

Divergence (documented): html2text also emits markdown markup for
emphasis/headings (``**b**``, ``# h1``). We emit plain text only — the
FTS5 tokenizer treats ``*``/``#`` as separators, so the indexed token
stream is identical either way.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from io import StringIO

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "blockquote", "pre", "section", "article", "header",
    "footer", "hr",
}
_SKIP_TAGS = {"script", "style"}
_MULTI_NL = re.compile(r"\n{3,}")


class _TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._out = StringIO()
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self._out.write("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS:
            self._out.write("\n")

    def handle_data(self, data):
        if not self._skip:
            self._out.write(data)

    def text(self) -> str:
        return _MULTI_NL.sub("\n\n", self._out.getvalue()).strip()


def html_to_text(html: str | None) -> str:
    """One string through the extractor (collector.py:102 semantics)."""
    if not html:
        return ""
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed markup: fall back to a crude tag strip — ingest must
        # never die on one bad document
        return re.sub(r"<[^>]*>", " ", html).strip()
    return p.text()


@F.pandas_udf(T.StringType())
def html_text_udf(s: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) HTML -> text column."""
    return s.map(html_to_text, na_action=None)
