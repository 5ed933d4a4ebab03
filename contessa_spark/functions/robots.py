"""Robots meta-directive detection: the ``noindex`` pre-filter crawl
pipelines honor before any content-quality rule (C4 §2.1 removes pages
"where any ... robots.txt/noindex" opts out; CCNet and FineWeb do the
same) — a page that asked not to be indexed should not become training
data either.

Reference parity: no counterpart in contessa (SURVEY.md §2
extension — the web-pipeline rule family).

Detection is a pure-JVM ``rlike`` over the lowercased html (two regex
forms cover both attribute orders) — whole-stage codegen at the scan,
no UDF, evaluated BEFORE the pipeline drops the html column. This is
deliberately a conservative SYNTAX match (a real crawler also honors
the ``X-Robots-Tag`` header and robots.txt, which live outside the
page payload and would arrive as separate columns).
"""

from __future__ import annotations

import re
from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

#: name=... appears before content=... (and vice versa). Values may be
#: quoted or bare; the name must be robots (or the googlebot/bingbot
#: variants pages use interchangeably); noindex may sit in a
#: comma-separated directive list.
_NAME_FIRST = (
    r"<meta[^>]*name\s*=\s*['\"]?(?:robots|googlebot|bingbot)['\"]?"
    r"[^>]*content\s*=\s*['\"]?[^'\">]*noindex"
)
_CONTENT_FIRST = (
    r"<meta[^>]*content\s*=\s*['\"]?[^'\">]*noindex[^>]*"
    r"name\s*=\s*['\"]?(?:robots|googlebot|bingbot)"
)


def noindex_col(html: Column) -> Column:
    """True when the html payload carries a robots noindex meta tag.
    NULL/undecodable html → false (absence of evidence keeps the page;
    other rules judge its content)."""
    lowered = F.lower(html.cast("string"))
    return F.coalesce(
        lowered.rlike(_NAME_FIRST) | lowered.rlike(_CONTENT_FIRST),
        F.lit(False),
    )


def py_has_noindex(html: Union[bytes, str, None]) -> bool:
    """Pure core — must agree with ``noindex_col`` decision-for-
    decision (same regexes over the same lowercasing)."""
    if html is None:
        return False
    if isinstance(html, bytes):
        try:
            html = html.decode("utf-8")
        except UnicodeDecodeError:
            html = html.decode("utf-8", "replace")
    lowered = html.lower()
    return bool(
        re.search(_NAME_FIRST, lowered) or re.search(_CONTENT_FIRST, lowered)
    )
