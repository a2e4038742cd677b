"""Text feature expressions — the shared intermediates every quality rule
builds on (SURVEY.md §4.1 "common-subexpression reuse").

Each feature is defined ONCE here with two views:
  * ``*_col(...)``  — a pyspark ``Column`` (JVM-side, whole-stage codegen;
    no Python in the hot path), and
  * ``*_sql(...)``  — the equivalent ANSI/DuckDB SQL fragment used by the
    correctness oracle.
Keeping both in one module is what guarantees the Spark plan and the DuckDB
oracle can never drift.

Tokenization contract (identical in both dialects):
  tokens(text) = non-empty pieces of trim(text) split on runs of the
  EXPLICIT ASCII whitespace class [ \\t\\n\\x0B\\f\\r].

Never use the ``\\s`` shorthand in cross-engine regexes: Java's \\s
includes \\x0B (vertical tab), RE2's does not, and Python ``str.split()``
adds the full Unicode whitespace set — three different tokenizations.
The fuzz-parity suite (tests/test_fuzz_parity.py) guards this.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# stopword lexicon — small fixed English function-word list (Gopher-style
# "must contain stop words" rule uses a tiny list; ours is pinned here and
# mirrored verbatim into the SQL oracle).
# ---------------------------------------------------------------------------
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that", "with",
    "for", "on", "as", "at", "be", "this", "by", "are", "was",
)


# ---------------------------------------------------------------------------
# tokens
# ---------------------------------------------------------------------------
#: explicit ASCII whitespace — identical under Java regex, RE2, and Python re
WS_RE = r"[ \t\n\x0B\f\r]+"


def tokens_col(text: Column) -> Column:
    """array<string> of non-empty whitespace-split tokens."""
    return F.filter(
        F.split(F.trim(F.coalesce(text, F.lit(""))), WS_RE),
        lambda t: F.length(t) > 0,
    )


def tokens_sql(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(trim(coalesce({text}, '')), "
        f"'{WS_RE}'), t -> len(t) > 0)"
    )


def n_words_col(toks: Column) -> Column:
    return F.size(toks).cast("bigint")


def n_words_sql(toks: str) -> str:
    return f"cast(len({toks}) as bigint)"


def n_chars_col(text: Column) -> Column:
    return F.length(F.coalesce(text, F.lit(""))).cast("bigint")


def n_chars_sql(text: str) -> str:
    return f"cast(length(coalesce({text}, '')) as bigint)"


# ---------------------------------------------------------------------------
# mean word length  (sum(len(token)) / n_words; 0.0 for empty docs)
# ---------------------------------------------------------------------------
def mean_word_len_col(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def mean_word_len_sql(toks: str) -> str:
    return (
        f"case when len({toks}) > 0 then "
        f"cast(list_sum(list_transform({toks}, t -> length(t))) as double) "
        f"/ cast(len({toks}) as double) else 0.0 end"
    )


# ---------------------------------------------------------------------------
# stopword fraction (tokens lowercased, multiplicity counted)
# ---------------------------------------------------------------------------
def stop_count_col(toks: Column, lowered: bool = False) -> Column:
    """``lowered=True`` skips per-token lower() when the caller already
    provides lowercase tokens (one transform pass shared by all rules).

    Membership via ``isin`` (optimizer converts the literal ``In`` to a
    hash-set ``InSet``) rather than ``array_contains`` over the literal
    array — same semantics (tokens never null), no linear scan."""
    key = (lambda t: t.isin(*STOPWORDS)) if lowered else (
        lambda t: F.lower(t).isin(*STOPWORDS)
    )
    return F.size(F.filter(toks, key)).cast("bigint")


def stop_count_sql(toks: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"cast(len(list_filter({toks}, t -> list_contains([{lst}], lower(t)))) "
        "as bigint)"
    )


def stop_fraction_col(toks: Column) -> Column:
    n = F.size(toks)
    return F.when(
        n > 0, stop_count_col(toks).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def stop_fraction_sql(toks: str) -> str:
    return (
        f"case when len({toks}) > 0 then cast({stop_count_sql(toks)} as double) "
        f"/ cast(len({toks}) as double) else 0.0 end"
    )


# ---------------------------------------------------------------------------
# repetition: fraction of distinct tokens (low => repetitive junk)
# ---------------------------------------------------------------------------
def distinct_fraction_col(toks: Column) -> Column:
    n = F.size(toks)
    return F.when(
        n > 0,
        F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(1.0))


def distinct_fraction_sql(toks: str) -> str:
    return (
        f"case when len({toks}) > 0 then "
        f"cast(len(list_distinct({toks})) as double) / cast(len({toks}) as double) "
        "else 1.0 end"
    )


# ---------------------------------------------------------------------------
# symbol-to-word ratio: non-alphanumeric, non-space chars per word
# ---------------------------------------------------------------------------
SYMBOL_RE = "[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"


def symbol_ratio_col(text: Column, toks: Column) -> Column:
    # NOTE: run-quantified ([...]+) regexp_replace measured 3x faster than
    # per-char, and length(regexp_replace) ~4x faster than F.regexp_count
    # (Spark 4.1 slow path); result length is identical either way
    sym = F.length(
        F.regexp_replace(
            F.coalesce(text, F.lit("")), "[A-Za-z0-9 \\t\\n\\x0B\\f\\r]+", ""
        )
    )
    n = F.size(toks)
    return F.when(n > 0, sym.cast("double") / n.cast("double")).otherwise(
        sym.cast("double")
    )


def symbol_ratio_sql(text: str, toks: str) -> str:
    sym = (
        f"length(regexp_replace(coalesce({text}, ''), "
        "'[A-Za-z0-9 \\t\\n\\x0B\\f\\r]+', '', 'g'))"
    )
    return (
        f"case when len({toks}) > 0 then cast({sym} as double) "
        f"/ cast(len({toks}) as double) else cast({sym} as double) end"
    )


# ---------------------------------------------------------------------------
# digit fraction of characters
# ---------------------------------------------------------------------------
def digit_fraction_col(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    digits = F.length(F.regexp_replace(t, "[^0-9]+", ""))
    return F.when(n > 0, digits.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def digit_fraction_sql(text: str) -> str:
    t = f"coalesce({text}, '')"
    return (
        f"case when length({t}) > 0 then "
        f"cast(length(regexp_replace({t}, '[^0-9]+', '', 'g')) as double) "
        f"/ cast(length({t}) as double) else 0.0 end"
    )


# ---------------------------------------------------------------------------
# repetition features (Gopher-style duplicate-line fraction)
# ---------------------------------------------------------------------------
def lines_col(text: Column) -> Column:
    """Non-empty trimmed lines of the document.  Splits on ``\\r?\\n`` so
    CRLF web pages don't leave a trailing ``\\r`` on every line (trim
    strips spaces only — r4 review: a stray CR failed the C4
    terminal-punctuation check on every CRLF document)."""
    return F.filter(
        F.transform(
            F.split(F.coalesce(text, F.lit("")), "\r?\n"),
            lambda l: F.trim(l),
        ),
        lambda l: F.length(l) > 0,
    )


def lines_sql(text: str) -> str:
    return (
        f"list_filter(list_transform(regexp_split_to_array("
        f"coalesce({text}, ''), '\\r?\\n'), l -> trim(l)), "
        "l -> len(l) > 0)"
    )


def dup_line_fraction_col(text: Column, lines: Column | None = None) -> Column:
    """Fraction of non-empty lines that repeat an earlier line — the Gopher
    duplicate-line repetition signal (boilerplate/nav chrome detector).
    1 - distinct/total in double with fixed op order (cross-engine
    bit-identical); 0.0 for documents with no non-empty lines.

    ``lines`` lets the caller pass a MATERIALIZED lines column (the
    split is referenced twice below and shared with the C4 line rule;
    an attribute evaluates once per row — see heuristics.feature_exprs)."""
    if lines is None:
        lines = lines_col(text)
    n = F.size(lines)
    return F.when(
        n > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def dup_line_fraction_sql(text: str) -> str:
    lines = lines_sql(text)
    return (
        f"case when len({lines}) > 0 then 1.0 - "
        f"cast(len(list_distinct({lines})) as double) / "
        f"cast(len({lines}) as double) else 0.0 end"
    )


def paragraphs_col(text: Column) -> Column:
    """Non-empty trimmed paragraphs (blank-line-separated blocks; CRLF
    blank lines count — see :func:`lines_col`)."""
    return F.filter(
        F.transform(
            F.split(F.coalesce(text, F.lit("")), "(\r?\n){2,}"),
            lambda p: F.trim(p),
        ),
        lambda p: F.length(p) > 0,
    )


def paragraphs_sql(text: str) -> str:
    return (
        f"list_filter(list_transform(regexp_split_to_array("
        f"coalesce({text}, ''), '(\\r?\\n){{2,}}'), p -> trim(p)), "
        "p -> len(p) > 0)"
    )


def dup_paragraph_fraction_col(
    text: Column, paras: Column | None = None
) -> Column:
    """Fraction of paragraphs that repeat an earlier paragraph — the
    Gopher duplicate-paragraph repetition signal (same shape as
    :func:`dup_line_fraction_col`, one structural level up)."""
    if paras is None:
        paras = paragraphs_col(text)
    n = F.size(paras)
    return F.when(
        n > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(paras)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def dup_paragraph_fraction_sql(text: str) -> str:
    paras = paragraphs_sql(text)
    return (
        f"case when len({paras}) > 0 then 1.0 - "
        f"cast(len(list_distinct({paras})) as double) / "
        f"cast(len({paras}) as double) else 0.0 end"
    )


def ngrams_col(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings ([] when the doc has fewer
    than n tokens).

    Shape matters (the HOF-lambda trap, BENCH.md r4): the original form
    sliced ``toks`` INSIDE a ``transform`` lambda, and a lambda re-
    evaluates every subexpression of its body per element — with the
    token-split inlined by CollapseProject that was O(n²) re-
    tokenization per document (measured: dup_2gram_fraction alone cost
    10.3s of the 15.7s full-profile run at 200k docs; this rewrite takes
    the whole feature to ~1s).  Here the shifted views of ``toks`` are
    ``zip_with`` ARGUMENTS — evaluated once per row — and the lambda
    only concatenates elements; identical output strings (vector-pinned
    + oracle-checked)."""
    size = F.size(toks)
    g = toks
    for j in range(2, n + 1):
        # shifted view; length clamps at 0 so short docs never hit
        # slice's negative-length error (the outer when() guards the
        # VALUE, not argument evaluation)
        shifted = F.slice(toks, j, F.greatest(size - (j - 1), F.lit(0)))
        # zip_with pads the shorter side with null; concat propagates
        # null, so the trailing j-1 grams become null and the final
        # slice drops them
        g = F.zip_with(g, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    g = F.slice(g, 1, F.greatest(size - (n - 1), F.lit(0)))
    return F.when(size >= n, g).otherwise(F.array().cast("array<string>"))


def ngrams_sql(toks: str, n: int) -> str:
    return (
        f"case when len({toks}) >= {n} then "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
        "else [] end"
    )


def dup_ngram_fraction_col(toks: Column, n: int) -> Column:
    """Fraction of word n-grams that repeat an earlier n-gram — the
    Gopher duplicate-n-gram repetition family (1 - distinct/total, fixed
    op order; 0.0 when the doc has fewer than n tokens)."""
    grams = ngrams_col(toks, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double")
        / total.cast("double"),
    ).otherwise(F.lit(0.0))


def dup_ngram_fraction_sql(toks: str, n: int) -> str:
    grams = ngrams_sql(toks, n)
    return (
        f"case when len({grams}) > 0 then 1.0 - "
        f"cast(len(list_distinct({grams})) as double) / "
        f"cast(len({grams}) as double) else 0.0 end"
    )


# ---------------------------------------------------------------------------
# within-document repeated-line removal (RefinedWeb line-wise cleanup)
# ---------------------------------------------------------------------------
def dedup_lines_col(text: Column) -> Column:
    """The document with every repeated line removed (RefinedWeb's
    line-wise correction): a line is dropped iff its TRIMMED form is
    non-empty and equals the trimmed form of an earlier line; blank /
    whitespace-only lines always pass through, so paragraph structure
    survives.  Kept lines keep their original bytes.  Null in, null out.

    Shape: one ``aggregate`` fold over the split — the lambda touches
    only its accumulator and element variables, so nothing outer is
    re-evaluated per element (the HOF re-inlining trap, BENCH.md r4).
    Per-doc cost is O(lines²) accumulator compares/copies — fine for
    crawl pages (10²-10³ lines), and per-document, so never a shuffle
    or skew concern at any corpus size."""
    lines = F.split(F.coalesce(text, F.lit("")), "\r?\n")
    empty = F.array().cast("array<string>")
    folded = F.aggregate(
        lines,
        F.struct(empty.alias("seen"), empty.alias("out")),
        lambda acc, x: F.when(
            (F.length(F.trim(x)) > 0)
            & F.array_contains(acc["seen"], F.trim(x)),
            acc,
        ).otherwise(
            F.struct(
                F.when(
                    F.length(F.trim(x)) > 0,
                    F.concat(acc["seen"], F.array(F.trim(x))),
                )
                .otherwise(acc["seen"])
                .alias("seen"),
                F.concat(acc["out"], F.array(x)).alias("out"),
            )
        ),
        lambda acc: F.array_join(acc["out"], "\n"),
    )
    return F.when(text.isNull(), F.lit(None).cast("string")).otherwise(
        folded
    )


def dedup_lines_sql(text: str) -> str:
    """DuckDB twin: keep line i iff blank, or its trim is absent from
    the trims of the earlier lines (earlier-kept == earlier-any for this
    predicate: a dropped line's trim was already present)."""
    l = f"regexp_split_to_array(coalesce({text}, ''), '\\r?\\n')"
    # coalesce(.., 0) = 0 — this DuckDB returns 0 for a miss (newer
    # versions return NULL); the coalesce form is correct for both
    keep = (
        f"len(trim(({l})[i])) = 0 or coalesce(list_position("
        f"[trim(x) for x in ({l})[1:i-1] if len(trim(x)) > 0], "
        f"trim(({l})[i])), 0) = 0"
    )
    return (
        f"case when {text} is null then null else array_to_string("
        f"[({l})[i] for i in range(1, len({l}) + 1) if {keep}], chr(10)) "
        f"end"
    )
