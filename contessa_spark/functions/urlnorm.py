"""URL canonicalization — the normalization pass that runs before any
URL-keyed dedup (batch ``dedup_urls`` or the streaming stateful
operator): crawl snapshots carry the same page as
``HTTP://Example.COM:80/a#frag`` and ``http://example.com/a``.

Rules (conservative subset of RFC 3986 §6 syntax-based normalization —
always-safe transforms only):
  * scheme and host lowercased;
  * default port stripped (``:80`` for http, ``:443`` for https);
  * fragment dropped;
  * empty path becomes ``/``.
Query strings are NOT touched (param reordering can change semantics).

Two implementations that must agree exactly: a JVM Column expression
(regexp_extract/CASE — codegen, no UDF) and a pure-Python core for
tests; the driver oracle runs the same regexes in DuckDB.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATHQ_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)"


def canonical_url_col(url: Column) -> Column:
    """JVM-side canonical form; non-URL strings pass through unchanged."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_extract(url, _PATHQ_RE, 1)
    pathq = F.when(pathq == "", F.lit("/")).otherwise(pathq)
    return F.when(scheme == "", url).otherwise(
        F.concat(scheme, F.lit("://"), host, pathq)
    )


def py_canonical_url(url: str) -> str:
    """Pure core — must agree with ``canonical_url_col`` byte-for-byte."""
    m = re.match(_SCHEME_RE, url)
    if not m:
        return url
    scheme = m.group(1).lower()
    hostport = (re.match(_HOSTPORT_RE, url).group(1) or "").lower()
    if scheme == "http":
        hostport = re.sub(r":80$", "", hostport)
    elif scheme == "https":
        hostport = re.sub(r":443$", "", hostport)
    pathq = re.match(_PATHQ_RE, url).group(1) or "/"
    return f"{scheme}://{hostport}{pathq}"
