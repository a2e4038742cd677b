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


def _guard_literal(key: str) -> str | None:
    """A literal substring every match of rule ``key`` provably
    contains (from the regex structure), or None.  Used to short-circuit
    the regex scan: ``contains`` is a plain substring search, an order
    of magnitude cheaper per byte than driving the regex engine over a
    document that cannot match.  EMAIL requires '@', IPV4 a '.', PHONE
    a mandatory hyphen; the blocklist guard is the common lowercase
    prefix of its terms (only used when ≥3 chars)."""
    if key == "pii_email":
        return "@"
    if key == "pii_ipv4":
        return "."
    if key == "pii_phone":
        return "-"
    if key == "toxicity_blocklist":
        import os.path

        p = os.path.commonprefix([t.lower() for t in BLOCKLIST_TERMS])
        return p if len(p) >= 3 else None
    return None


def _guard_col(t: Column, key: str) -> Column | None:
    g = _guard_literal(key)
    if g is None:
        return None
    if key == "toxicity_blocklist":  # (?i) regex ⇒ case-insensitive guard
        return F.contains(F.lower(t), F.lit(g))
    return F.contains(t, F.lit(g))


def hit_col(text: Column, key: str) -> Column:
    """Boolean Column: does `text` contain a match for rule `key`?
    Guarded: the regex only runs when the text contains a literal every
    match provably contains — identical truth value, large constant-
    factor saving on non-matching documents (the common case)."""
    regex = {k: r for k, r, _ in SCRUB_CHAIN}[key]
    t = F.coalesce(text, F.lit(""))
    base = t.rlike(regex)
    g = _guard_col(t, key)
    return base if g is None else (g & base)


def hit_sql(text: str, key: str) -> str:
    regex = {k: r for k, r, _ in SCRUB_CHAIN}[key]
    return f"regexp_matches(coalesce({text}, ''), '{_sql_quote(regex)}')"


def scrub_col(text: Column) -> Column:
    """Apply the full canonical scrub chain (fixed order).

    Each stage is guarded: ``regexp_replace(s, re, tok) == s`` whenever
    ``s`` lacks a literal every match of ``re`` contains, so the regex
    pass runs only on documents that might match — byte-identical
    output (golden + oracle pinned), regex cost only where it can pay.
    Whole-stage codegen's subexpression elimination keeps each stage's
    input single-evaluated despite the when/otherwise referencing it
    twice (measured: the guarded chain is ~4x faster on non-matching
    text and not slower on matching text)."""
    out = F.coalesce(text, F.lit(""))
    for key, regex, token in SCRUB_CHAIN:
        g = _guard_col(out, key)
        rep = F.regexp_replace(out, regex, token)
        out = rep if g is None else F.when(g, rep).otherwise(out)
    return out


def scrub_sql(text: str) -> str:
    out = f"coalesce({text}, '')"
    for _, regex, token in SCRUB_CHAIN:
        out = f"regexp_replace({out}, '{_sql_quote(regex)}', '{token}', 'g')"
    return out


def _sql_quote(regex: str) -> str:
    return regex.replace("'", "''")


# ---------------------------------------------------------------------------
# Opt-in payment-card scrubbing (NOT in SCRUB_CHAIN: the chain's output is
# the golden-pinned byte-identity contract; adding a stage would change
# every shipped scrubbed_text.  Compose it explicitly where needed.)
#
# A regex alone over-redacts (phone-ish digit runs); each candidate is
# verified with the Luhn checksum (functions/checkdigits.py carries the
# vectorized column-level validator) before replacement, so only
# checksum-valid PANs are touched.  Verification is inherently
# procedural — this is an Arrow pandas UDF with per-match Python, the
# documented slow path, opt-in like the ARPA scorer; no DuckDB twin
# (pinned against hand vectors instead).
# ---------------------------------------------------------------------------
def scrub_credit_cards_udf() -> Column:
    """Arrow UDF: replace Luhn-valid 13-19 digit card candidates
    (optionally space/dash separated) with ``<CARD>``; checksum-invalid
    digit runs pass through untouched."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # ONE Luhn rule definition for detection and scrubbing (the
    # vectorized validator in checkdigits.py is parity-pinned to it)
    from mysql_data_quality_spark.functions.checkdigits import luhn_ok

    pat = _re.compile(r"(?<!\d)(?:\d[ -]?){12,18}\d(?!\d)")

    def repl(m: "_re.Match") -> str:
        return (
            "<CARD>"
            if luhn_ok(_re.sub(r"\D", "", m.group(0)))
            else m.group(0)
        )

    # no type hints: pandas is imported locally, so quoted 'pd.Series'
    # hints can't resolve against module globals (pandas_udf would raise)
    def batch(values):
        # null-preserving, matching the regexp_replace scrub chain's
        # convention (NULL in -> NULL out, never '')
        return values.map(
            lambda s: pat.sub(repl, s) if isinstance(s, str) else s
        )

    return pandas_udf(batch, "string")
