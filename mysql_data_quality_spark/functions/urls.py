"""URL canonicalization for crawl dedup.

Re-crawls of the same page differ in URL dressing — fragment, tracking
query, case of scheme/host, default ports, trailing slash.  Canonicalizing
BEFORE url-keyed dedup/bucketing collapses those variants.

Cross-engine contract (same as :mod:`rules.pii`): every transformation is
a pinned-order chain of capture-free regexes in the Java∩RE2 common subset
(no $1/\\1 replacement — the two engines disagree on the syntax), so the
DuckDB oracle produces byte-identical canonical urls.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: host (+optional port) prefix of an absolute URL
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonical_url_col(url: Column) -> Column:
    """Canonical form: lowercase scheme://host, default :80/:443 ports
    stripped, query and fragment dropped, trailing slash removed.
    Pure Column ops; mirrored by :func:`canonical_url_sql`."""
    u = F.coalesce(url, F.lit(""))
    # 1. drop fragment then query (order pinned)
    u = F.regexp_replace(u, r"#[^#]*$", "")
    u = F.regexp_replace(u, r"\?[^?]*$", "")
    # 2. lowercase the scheme://host[:port] prefix, keep the path as-is
    head = F.lower(F.regexp_extract(u, _HOST_RE, 0))
    tail = F.regexp_replace(u, _HOST_RE, "")
    # 3. strip default ports from the lowered head
    head = F.regexp_replace(head, r":80$", "")
    head = F.regexp_replace(head, r":443$", "")
    # 4. drop a trailing slash on a non-empty path
    tail = F.regexp_replace(tail, r"/$", "")
    return F.concat(head, tail)


def canonical_url_sql(url: str) -> str:
    u = f"coalesce({url}, '')"
    u = f"regexp_replace({u}, '#[^#]*$', '')"
    u = f"regexp_replace({u}, '\\?[^?]*$', '')"
    head = f"lower(regexp_extract({u}, '{_HOST_RE}', 0))"
    head = f"regexp_replace({head}, ':80$', '')"
    head = f"regexp_replace({head}, ':443$', '')"
    tail = f"regexp_replace(regexp_replace({u}, '{_HOST_RE}', ''), '/$', '')"
    return f"({head} || {tail})"
