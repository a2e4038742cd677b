"""HTML → visible-text extraction as cross-engine Column/SQL pairs.

The north-star pipeline's input is an Iceberg table of Common-Crawl-style
pages carrying BOTH ``html: binary`` and ``text: string``; the driver's
synthetic tables arrive with ``text`` already extracted, so the engine so
far consumed it as-is.  This module closes the loop for corpora where
only the raw payload exists (the reference analogue is the "strip
formatting" scrub, ``/root/reference/src/data_quality/validators/
patterns.py`` — format-noise removal before validation): a deterministic,
regex-based visible-text extractor good for the boilerplate-heavy crawl
case, as pure Column expressions with a byte-identical DuckDB mirror.

Deliberately NOT a browser-grade DOM parser (that would be a per-row
Python library call — the slow path); the rule chain below is the classic
crawl-pipeline shape (strip comments/script/style, block tags → newline,
strip tags, unescape core entities, collapse whitespace) and every step
is a JVM/RE2-compatible regex or literal replace, so it runs inside
whole-stage codegen at 100 TB and DuckDB replays it byte-for-byte.

Ordering contract (pinned by tests): comments → script → style → block
tags → all tags → entities (``&amp;`` LAST, so ``&amp;lt;`` decodes to
the literal ``&lt;`` exactly once, the standard single-pass unescape) →
whitespace collapse.  No backreferences (RE2 has none), no lookbehind.

Encoding precondition: the payload must be valid UTF-8 for cross-engine
parity — Spark's ``decode(..., 'UTF-8')`` substitutes U+FFFD on
malformed bytes and keeps going, while DuckDB's ``decode(blob)`` RAISES
on them, so the SQL twin only mirrors the Column form on well-formed
input (crawl payloads in other encodings should be transcoded at
ingest; the Spark side alone degrades gracefully either way).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tags whose END (or self) marks a line break in visible text
_BLOCK_RE = r"(?i)</?(br|p|div|h[1-6]|li|tr|td|th|ul|ol|table|section|article|header|footer)\b[^>]*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_TAG_RE = r"(?s)<[^>]*>"
#: intra-line whitespace (explicit class: Java \s and RE2 \s disagree on
#: vertical tab — same rule as functions/text.py)
_SP_RE = "[ \\t\\x0B\\f\\r]+"

#: (entity, replacement) in APPLICATION ORDER; &amp; must come last
ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def extract_text_col(html: Column) -> Column:
    """``html: binary`` (UTF-8 bytes) → visible text string ('' for NULL
    payloads — never NULL, like c4_clean_text)."""
    s = F.coalesce(F.decode(html, "UTF-8"), F.lit(""))
    s = F.regexp_replace(s, _COMMENT_RE, "")
    s = F.regexp_replace(s, _SCRIPT_RE, "")
    s = F.regexp_replace(s, _STYLE_RE, "")
    s = F.regexp_replace(s, _BLOCK_RE, "\n")
    s = F.regexp_replace(s, _TAG_RE, " ")
    for ent, rep in ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    # collapse runs of spaces/tabs, trim each line, drop blank lines;
    # NB plain trim() strips spaces only in BOTH engines, so the edge
    # strip must be a regex that also eats newlines
    s = F.regexp_replace(s, _SP_RE, " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n{2,}", "\n")
    return F.regexp_replace(s, r"^[\n ]+|[\n ]+$", "")


def extract_text_sql(html: str) -> str:
    """DuckDB twin (``html`` is a BLOB column/expression)."""
    s = f"coalesce(decode({html}), '')"
    for pat in (_COMMENT_RE, _SCRIPT_RE, _STYLE_RE):
        # DuckDB RE2 takes inline flags too; 'g' flag for replace-all
        s = f"regexp_replace({s}, '{pat}', '', 'g')"
    s = f"regexp_replace({s}, '{_BLOCK_RE}', chr(10), 'g')"
    s = f"regexp_replace({s}, '{_TAG_RE}', ' ', 'g')"
    for ent, rep in ENTITIES:
        rep_sql = rep.replace("'", "''")
        s = f"replace({s}, '{ent}', '{rep_sql}')"
    s = f"regexp_replace({s}, '{_SP_RE}', ' ', 'g')"
    s = f"regexp_replace({s}, ' ?\\n ?', chr(10), 'g')"
    s = f"regexp_replace({s}, '\\n{{2,}}', chr(10), 'g')"
    return f"regexp_replace({s}, '^[\\n ]+|[\\n ]+$', '', 'g')"


# ---------------------------------------------------------------------------
# robots meta directives — a crawl pipeline that keeps noindex'd pages is
# republishing content the site owner opted out of surfacing
# ---------------------------------------------------------------------------
#: <meta ... name="robots" ... content="...noindex..."> in either
#: attribute order, quotes optional — common subset of Java regex / RE2
#: (no backreferences or lookaround, so the two orders are spelled out).
#: The name value must be exactly `robots` (name="robotsmeta" is some
#: OTHER meta tag) and `noindex` must be a comma/space-separated TOKEN of
#: the content value (robots directives are comma-separated: 'noindexing'
#: / 'noindex-demo' are not the noindex directive) — matching either as a
#: mere substring deletes pages whose owner never opted out.
_NOIDX_QVAL = r"[\"'](?:[^\"'>]*[\s,])?noindex(?:[\s,][^\"'>]*)?[\"']"
_NOIDX_BARE = r"(?:[^\s>\"']*,)?noindex(?:,[^\s>\"']*)?"
_ROBOTS_QVAL = r"[\"']\s*robots\s*[\"']"
_NOINDEX_RE = (
    r"(?is)<meta\b(?:"
    # name="robots" ... content="... noindex ..."
    r"[^>]*[\s\"']name\s*=\s*"
    r"(?:" + _ROBOTS_QVAL + r"[^>]*[\s\"']|robots\s(?:[^>]*[\s\"'])?)"
    r"content\s*=\s*(?:" + _NOIDX_QVAL + r"|" + _NOIDX_BARE + r"[\s/>])"
    r"|"
    # content="... noindex ..." ... name="robots"
    r"[^>]*[\s\"']content\s*=\s*"
    r"(?:" + _NOIDX_QVAL + r"[^>]*[\s\"']|"
    + _NOIDX_BARE + r"\s(?:[^>]*[\s\"'])?)"
    r"name\s*=\s*(?:" + _ROBOTS_QVAL + r"|robots\s*/?>|robots\s)"
    r")"
)


def html_noindex_col(html: Column) -> Column:
    """True where the raw payload carries a robots ``noindex`` meta tag
    (either attribute order, any case, quoted or bare).  Pure Column
    regex over the decoded payload — zero shuffles; NULL/empty html →
    false."""
    return F.coalesce(F.decode(html, "UTF-8"), F.lit("")).rlike(_NOINDEX_RE)


def html_noindex_sql(html: str) -> str:
    """DuckDB twin (same pattern; see the module's encoding
    precondition)."""
    pat = _NOINDEX_RE.replace("'", "''")
    return (
        f"regexp_matches(coalesce(decode({html}), ''), '{pat}')"
    )


def drop_noindex(pages, html_col: str = "html"):
    """Corpus minus noindex'd pages — a pure-map filter (rows whose html
    is NULL are kept: no payload, no directive)."""
    return pages.where(~html_noindex_col(F.col(html_col)))
