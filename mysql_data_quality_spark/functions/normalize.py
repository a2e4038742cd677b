"""Unicode text normalization — the first-touch cleanup stage of a web
corpus pipeline: crawled pages mix composed and decomposed accent forms
(NFC vs NFD: 'é' as one codepoint vs 'e' + U+0301), and carry invisible
control/format characters (C0/C1 controls from broken encodings,
zero-width spaces/joiners, BOMs pasted mid-text).  Without this stage,
visually identical paragraphs hash differently — silently degrading
every downstream dedup/decontamination key — and token counts drift.

Two layers:

* **control stripping** is pure JVM Column regex (whole-stage codegen,
  zero Python): C0 controls except tab/newline/CR, DEL + C1 controls,
  zero-width space/non-joiner/joiner, and the BOM/ZWNBSP;
* **NFC canonical normalization** has no Spark built-in, so it is an
  Arrow-batched pandas UDF over CPython's C-implemented
  ``unicodedata``.  The hot path is ``is_normalized('NFC', s)`` — web
  text is overwhelmingly already NFC, so the common case is a C-level
  scan with ZERO allocation and only the rare decomposed string pays
  for a rebuild.  At 100 TB this stage is a pure map (no shuffle, no
  state); the Arrow boundary is the only cost and it batches.

``form='NFKC'`` (compatibility: ligatures 'ﬁ'→'fi', fullwidth→ASCII,
superscripts→digits — the aggressive fold CCNet/fastText use before
language ID) is supported on the Spark side; DuckDB exposes only
``nfc_normalize``, so the NFKC path is pinned by pytest against the
CPython reference instead of the cross-engine oracle (same adjudication
as the xxhash64 hash family).

Reference analogue: the reference scrubs/normalizes values before its
format validators (``/root/reference/src/data_quality/validators/
patterns.py``); this is the corpus-scale generalization applied to the
document text itself.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# One character class, shared LITERALLY by both engines — fully escaped
# (\x{hhhh} is valid in Java regex AND RE2, and raw control bytes inside
# a SQL literal would break the DuckDB parser): C0 minus \t\n\r, DEL +
# C1, zero-width space / non-joiner / joiner, BOM.
_CONTROL_CLASS = (
    r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F"
    r"\x{200B}-\x{200D}\x{FEFF}]"
)

_FORMS = ("NFC", "NFKC")


def strip_controls_col(text: Column) -> Column:
    """Remove control/format characters (keeps tab, newline, CR).  Pure
    codegen regex — no Python."""
    return F.regexp_replace(text, _CONTROL_CLASS, "")


def strip_controls_sql(text: str) -> str:
    return f"regexp_replace({text}, '{_CONTROL_CLASS}', '', 'g')"


def _normalize_series(s: pd.Series, form: str) -> pd.Series:
    # is_normalized is a C-level scan with no allocation — the
    # overwhelmingly common already-normalized case never rebuilds.
    return s.map(
        lambda t: t
        if not isinstance(t, str) or unicodedata.is_normalized(form, t)
        else unicodedata.normalize(form, t),
        na_action=None,
    )


def unicode_normalize_col(text: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (Arrow-batched; no JVM
    built-in exists).  ``form``: NFC (canonical — cross-engine oracle
    via DuckDB ``nfc_normalize``) or NFKC (compatibility fold)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}: {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return _normalize_series(s, form)

    return _norm(text)


def unicode_normalize_sql(text: str) -> str:
    """DuckDB twin (NFC only — DuckDB has no NFKC function)."""
    return f"nfc_normalize({text})"


def normalized_text_col(text: Column, form: str = "NFC") -> Column:
    """Control strip + Unicode normalization (the composed cleanup)."""
    return unicode_normalize_col(strip_controls_col(text), form)


def normalized_text_sql(text: str) -> str:
    return unicode_normalize_sql(strip_controls_sql(text))


def normalize_corpus(
    df: DataFrame, text_col: str = "text", form: str = "NFC"
) -> DataFrame:
    """The corpus with ``text_col`` cleaned in place (null-preserving;
    all other columns untouched).  A pure map — zero shuffles at any
    scale."""
    return df.withColumn(
        text_col, normalized_text_col(F.col(text_col), form)
    )


def normalize_corpus_sql(
    rel: str, text_col: str = "text", form: str = "NFC"
) -> str:
    if form != "NFC":
        raise ValueError("DuckDB twin supports NFC only")
    return (
        f"select * replace ({normalized_text_sql(text_col)} as "
        f"{text_col}) from {rel}"
    )


# ---------------------------------------------------------------------------
# Mojibake repair (the ftfy-style double-encoding fix every web-text
# pipeline runs; original implementation from the public failure model)
# ---------------------------------------------------------------------------
#: bytes that only appear in text DECODED WITH THE WRONG CODEC: UTF-8
#: lead/continuation bytes rendered as cp1252/latin-1 characters.  A
#: string with none of these is returned untouched (the overwhelmingly
#: common case — one frozenset probe per char, no re-encode).
_MOJIBAKE_HINTS = frozenset(
    "Ã¢â€šÂ¬Å¡Æ'Ä‹ÅĞİŞ" + "".join(chr(c) for c in range(0x80, 0xA0))
)


def fix_mojibake_text(t: str, max_rounds: int = 2) -> str:
    """Undo UTF-8-read-as-cp1252/latin-1 mojibake ("Ã©" -> "é",
    "â€™" -> "’"), up to ``max_rounds`` nested layers.

    Failure model: correct UTF-8 bytes were decoded with a single-byte
    codec, so every multi-byte character surfaced as 2-4 single-byte
    characters.  The inverse — re-encode with that codec, decode as
    UTF-8 — is attempted per round and kept ONLY when it round-trips
    exactly (strict decode succeeds and the repaired string is
    shorter); anything else returns the input unchanged, so legitimate
    text containing "Ã" sequences cannot be corrupted into the wrong
    repair (the operation is applied only when it is a perfect
    inverse).  cp1252 is tried before latin-1 (the web's de-facto
    single-byte codec; latin-1 catches the 0x80-0x9F gap cp1252 leaves
    undefined)."""
    if not isinstance(t, str):
        return t
    for _ in range(max_rounds):
        if not any(c in _MOJIBAKE_HINTS for c in t):
            return t
        repaired = None
        for enc in (_encode_sloppy_cp1252, _encode_latin1):
            try:
                candidate = enc(t).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            if len(candidate) < len(t):
                repaired = candidate
                break
        if repaired is None:
            return t
        t = repaired
    return t


#: cp1252 leaves 0x81/0x8D/0x8F/0x90/0x9D undefined, but WHATWG
#: windows-1252 (what browsers and hence real mojibake use) passes them
#: through as the C1 controls — 'â€\\x9d' for a right quote is the
#: canonical example.  The sloppy encoder mirrors that (ftfy's
#: "sloppy-windows-1252" idea, reimplemented).
_C1_PASSTHROUGH = frozenset({0x81, 0x8D, 0x8F, 0x90, 0x9D})


def _encode_sloppy_cp1252(t: str) -> bytes:
    try:
        return t.encode("cp1252")
    except UnicodeEncodeError:
        out = bytearray()
        for ch in t:
            o = ord(ch)
            if o in _C1_PASSTHROUGH:
                out.append(o)
            else:
                out.extend(ch.encode("cp1252"))  # may raise -> caller
        return bytes(out)


def _encode_latin1(t: str) -> bytes:
    return t.encode("latin-1")


def fix_mojibake_col(text: Column) -> Column:
    """Arrow-batched mojibake repair column (no SQL twin: the
    encode/decode round-trip test has no DuckDB analogue — parity is
    pinned by a generated two-engine-free fuzz suite instead)."""

    @pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        return s.map(fix_mojibake_text, na_action=None)

    return _fix(text)
