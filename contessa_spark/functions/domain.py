"""Registrable-domain extraction + per-domain corpus rollups — the
web-pipeline grouping key for hot-domain skew handling, per-domain
quality statistics, and blocklist filtering (C4 §2.1's badlist pass;
FineWeb's per-domain accounting).

The registrable domain ("example.co.uk" for
"shop.example.co.uk:443") uses a PUBLIC-SUFFIX-LITE rule: a small
built-in set of common multi-part suffixes selects the last THREE
host labels, otherwise the last two. This is deliberately a
deterministic approximation, not a bundled Mozilla PSL snapshot (that
list is versioned data, and the engine contract here is
SQL-reproducibility: the same rule re-expresses verbatim in the
DuckDB oracle — see ``registrable_domain_sql``). Swap-in point for a
full PSL: replace ``MULTIPART_SUFFIXES``.

Reference parity: contessa has no URL layer — this is a
forward-looking training-pipeline extension (SURVEY.md §2 scope
note), like the rest of the domain/web operators.

Everything is pure JVM Column code (regex + CASE; codegen, no UDF) —
on a 10¹²-row crawl the domain key is computed inside the scan
projection and feeds a map-side-combined aggregate.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

#: common second-level public suffixes (registrable domain = 3 labels)
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au",
    "co.in", "net.in", "org.in",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "com.mx", "co.za", "com.sg", "co.kr", "com.tr",
)


#: ONE regex does scheme check + userinfo-strip + www-strip + host
#: capture (port and everything after the first ``:`` excluded). A
#: chain of three regex ops here once blew whole-stage codegen past
#: janino's 64 KB method limit: Column trees can't share
#: subexpressions, so the host chain re-embeds into every one of the
#: ~10 places the domain CASE uses it, multiplying tree size by chain
#: length. Keep this ONE node.
#:
#: The userinfo group ``(?:[^/?#]*@)?`` is greedy, so it consumes up
#: to the LAST ``@`` before the path — ``user:pass@host`` and even the
#: invalid ``a@b@host`` both resolve to ``host`` (without it,
#: ``https://anything@blocked.com/`` captured ``anything@blocked.com``
#: and sailed past the domain blocklist).
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#]*@)?(?:[wW][wW][wW]\.)?([^/?#:]*)"


def host_col(url: Column) -> Column:
    """Lowercased host: port and a leading ``www.`` stripped; empty
    string when the input is not a ``scheme://`` URL."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def registrable_domain_col(url: Column) -> Column:
    """Registrable domain of a URL as a Column (NULL for non-URLs)."""
    host = host_col(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    two = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    three = F.concat_ws(".", F.try_element_at(labels, F.lit(-3)), two)
    return (
        F.when(host == "", F.lit(None).cast("string"))
        .when((n >= 3) & two.isin(*MULTIPART_SUFFIXES), three)
        .when(n >= 2, two)
        .otherwise(host)
    )


def registrable_domain_sql(url_expr: str) -> str:
    """The SAME rule as an ANSI/DuckDB SQL scalar expression over
    ``url_expr`` — for oracle sharing. Mirrors ``registrable_domain_col``
    decision-for-decision."""
    host = (
        f"lower(regexp_extract({url_expr}, "
        f"'^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/?#]*@)?(?:[wW][wW][wW]\\.)?([^/?#:]*)', 1))"
    )
    suffixes = ", ".join(f"'{s}'" for s in MULTIPART_SUFFIXES)
    l = f"string_split({host}, '.')"
    two = f"({l}[-2] || '.' || {l}[-1])"
    three = f"({l}[-3] || '.' || {two})"
    return (
        f"CASE WHEN {host} = '' THEN NULL "
        f"WHEN len({l}) >= 3 AND {two} IN ({suffixes}) THEN {three} "
        f"WHEN len({l}) >= 2 THEN {two} "
        f"ELSE {host} END"
    )


def py_registrable_domain(url: str) -> Optional[str]:
    """Pure core — must agree with both SQL/Column forms exactly."""
    m = re.match(_HOST_RE, url)
    if not m:
        return None
    host = m.group(1).lower()
    if not host:
        return None
    labels = host.split(".")
    if len(labels) >= 3 and ".".join(labels[-2:]) in MULTIPART_SUFFIXES:
        return ".".join(labels[-3:])
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return host
