"""URL canonicalization for crawl dedup.

Re-crawls of the same page differ in URL dressing — fragment, tracking
query, case of scheme/host, default ports, trailing slash.  Canonicalizing
BEFORE url-keyed dedup/bucketing collapses those variants.

Cross-engine contract (same as :mod:`rules.pii`): every transformation is
a pinned-order chain of capture-free regexes in the Java∩RE2 common subset
(no $1/\\1 replacement — the two engines disagree on the syntax) plus
engine-agnostic CASE/when conditionals, so the DuckDB oracle produces
byte-identical canonical urls.

r2 ADVICE fixes (both engines changed in lockstep):
  * fragment/query strip from the FIRST delimiter (``#[\\s\\S]*$`` /
    ``\\?[\\s\\S]*$`` — ``[\\s\\S]`` instead of ``.`` so a hostile url
    containing a newline behaves identically under Java and RE2 DOTALL
    defaults), so ``http://x/p#a#b`` → ``http://x/p`` and
    ``http://x/p?q=a?b`` → ``http://x/p``;
  * default ports are scheme-aware: ``:80`` stripped only for http,
    ``:443`` only for https — ``http://host:443`` is NOT the same
    endpoint as ``http://host``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: host (+optional port) prefix of an absolute URL
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonical_url_col(url: Column) -> Column:
    """Canonical form: lowercase scheme://host, scheme-default port
    stripped, query and fragment dropped (from their first delimiter),
    trailing slash removed.  Pure Column ops; mirrored by
    :func:`canonical_url_sql`."""
    u = F.coalesce(url, F.lit(""))
    # 1. drop fragment then query — each from the FIRST delimiter
    u = F.regexp_replace(u, r"#[\s\S]*$", "")
    u = F.regexp_replace(u, r"\?[\s\S]*$", "")
    # 2. lowercase the scheme://host[:port] prefix, keep the path as-is
    head = F.lower(F.regexp_extract(u, _HOST_RE, 0))
    tail = F.regexp_replace(u, _HOST_RE, "")
    # 3. strip the scheme's OWN default port only
    head = F.when(
        head.startswith("http://"), F.regexp_replace(head, ":80$", "")
    ).otherwise(head)
    head = F.when(
        head.startswith("https://"), F.regexp_replace(head, ":443$", "")
    ).otherwise(head)
    # 4. drop a trailing slash on a non-empty path
    tail = F.regexp_replace(tail, r"/$", "")
    return F.concat(head, tail)


def canonical_url_sql(url: str) -> str:
    u = f"coalesce({url}, '')"
    u = f"regexp_replace({u}, '#[\\s\\S]*$', '')"
    u = f"regexp_replace({u}, '\\?[\\s\\S]*$', '')"
    head = f"lower(regexp_extract({u}, '{_HOST_RE}', 0))"
    head = (
        f"(case when {head} like 'http://%' "
        f"then regexp_replace({head}, ':80$', '') else {head} end)"
    )
    head = (
        f"(case when {head} like 'https://%' "
        f"then regexp_replace({head}, ':443$', '') else {head} end)"
    )
    tail = f"regexp_replace(regexp_replace({u}, '{_HOST_RE}', ''), '/$', '')"
    return f"({head} || {tail})"


#: host of an absolute URL: optional userinfo skipped (user:pass@),
#: bracketed IPv6 literal or reg-name captured, port excluded
_DOMAIN_HOST_RE = (
    r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?"
    r"(\[[^\]]+\]|[^/?#:@\[]+)"
)


def url_host_col(url: Column) -> Column:
    """Registered host of an absolute URL (lowercased, port stripped,
    userinfo skipped, IPv6 literals kept whole) — the domain key for
    per-site aggregation, skew salting, blocklists, and domain-level
    admission.  '' for strings without a scheme://host prefix.

    Trailing dots are stripped: ``example.com.`` (an absolute FQDN, the
    DNS root label spelled out) names the SAME site as ``example.com``,
    so without the strip a blocklisted or threshold-flagged domain could
    be evaded — and its stats split across two keys — by a single
    trailing dot in the URL."""
    host = F.regexp_extract(F.coalesce(url, F.lit("")), _DOMAIN_HOST_RE, 1)
    return F.lower(F.regexp_replace(host, r"\.+$", ""))


def url_host_sql(url: str) -> str:
    # raw pattern embeds directly: no quotes inside, and DuckDB treats
    # backslashes in single-quoted strings literally (RE2 sees \[ \])
    return (
        f"lower(regexp_replace(coalesce(regexp_extract(coalesce({url}, ''), "
        f"'{_DOMAIN_HOST_RE}', 1), ''), '\\.+$', ''))"
    )
