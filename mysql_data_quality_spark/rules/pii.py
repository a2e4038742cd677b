"""PII / toxicity detection and scrubbing.

Generalizes the reference's pattern library
(``/root/reference/src/data_quality/validators/patterns.py:30-56`` — email,
Brazilian phone, etc.) from anchored whole-value validation into
find-anywhere detection + redaction over free text, applied as a canonical
ordered ``regexp_replace`` chain (reference analogue of the strip-formatting
``re.sub`` at patterns.py:301).

Determinism contract (north rule: byte-identical scrubbed text per url):
the chain order is pinned (EMAIL -> IPV4 -> PHONE -> BLOCKLIST), each regex
is a pure function of the input string, and every regex is written in the
common subset of Java regex (Spark) and RE2 (DuckDB oracle): no lookbehind,
no backreferences, inline ``(?i)`` only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# find-anywhere variants of the reference's anchored patterns
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# generalized from the reference's phone_br (patterns.py:46-50): optional
# (DD) area code, 4-5 digit prefix, mandatory hyphen, 4 digit suffix.
# NB: explicit whitespace class, not \s — Java \s matches \x0B but RE2
# (the DuckDB oracle) \s does not, which would break byte-identity for
# '(12)\x0B1234-5678'-shaped input.  [ \t\n\x0B\f\r] IS Java's \s.
PHONE_RE = r"(\(\d{2}\)[ \t\n\x0B\f\r]?)?\b\d{4,5}-\d{4}\b"
BLOCKLIST_TERMS: tuple[str, ...] = ("badword1", "badword2", "badword3")
BLOCKLIST_RE = r"(?i)\b(" + "|".join(BLOCKLIST_TERMS) + r")\b"

#: canonical scrub chain: (rule_key, regex, replacement token)
SCRUB_CHAIN: tuple[tuple[str, str, str], ...] = (
    ("pii_email", EMAIL_RE, "<EMAIL>"),
    ("pii_ipv4", IPV4_RE, "<IP>"),
    ("pii_phone", PHONE_RE, "<PHONE>"),
    ("toxicity_blocklist", BLOCKLIST_RE, "<BLOCKED>"),
)


def hit_col(text: Column, key: str) -> Column:
    """Boolean Column: does `text` contain a match for rule `key`?"""
    regex = {k: r for k, r, _ in SCRUB_CHAIN}[key]
    return F.coalesce(text, F.lit("")).rlike(regex)


def hit_sql(text: str, key: str) -> str:
    regex = {k: r for k, r, _ in SCRUB_CHAIN}[key]
    return f"regexp_matches(coalesce({text}, ''), '{_sql_quote(regex)}')"


def scrub_col(text: Column) -> Column:
    """Apply the full canonical scrub chain (fixed order)."""
    out = F.coalesce(text, F.lit(""))
    for _, regex, token in SCRUB_CHAIN:
        out = F.regexp_replace(out, regex, token)
    return out


def scrub_sql(text: str) -> str:
    out = f"coalesce({text}, '')"
    for _, regex, token in SCRUB_CHAIN:
        out = f"regexp_replace({out}, '{_sql_quote(regex)}', '{token}', 'g')"
    return out


def _sql_quote(regex: str) -> str:
    return regex.replace("'", "''")
