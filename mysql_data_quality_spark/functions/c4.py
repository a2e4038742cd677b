"""C4-style line-level cleaning (Raffel et al. 2020, the Colossal Clean
Crawled Corpus rules) as cross-engine Column/SQL pairs.

The C4 pipeline's line filter keeps a line only if it (a) ends in a
terminal punctuation mark, (b) has at least three words, and (c) does
not contain the word "javascript"; page-level rules additionally drop
documents containing "lorem ipsum" or a curly brace.  This module
implements the line filter as pure Column expressions (split → filter →
rejoin, no Python) with a byte-identical DuckDB mirror, exposing:

  * ``c4_clean_text`` — the document with non-qualifying lines removed
    (the C4 transformation itself);
  * ``c4_kept_line_fraction`` — kept/total lines, the quality feature a
    threshold rule can act on (a page whose lines are mostly chrome /
    code / fragments scores low);
  * ``lorem_ipsum`` / ``curly_brace`` page predicates.

All fractions use the fixed 1-op-order double math the other features
use (cross-engine bit-identity); the corresponding registry rules ship
DISABLED by default — enabling them (``DQS_RULE_*_ENABLED=true``)
changes decisions, so the shipped defaults keep round-1 golden labels
byte-stable, same policy as ``line_repetition``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mysql_data_quality_spark.functions.text import lines_col, lines_sql

#: terminal punctuation per C4: period, exclamation mark, question mark,
#: and the end quotation mark — exactly the published rule set (Raffel et
#: al. 2020 §2.2).  A bare apostrophe is NOT a C4 end mark (r4 ADVICE):
#: lines ending in ' are dropped, matching the published behavior.
TERMINAL = (".", "!", "?", '"')
MIN_LINE_WORDS = 3

_LINE_WS = "[ \t\\x0B\f\r]+"  # intra-line whitespace (lines carry no \n)


def _line_ok_col(line: Column) -> Column:
    last = F.substring(line, -1, 1)
    # filter empty tokens (the tokens_col contract): a leading tab/FF
    # survives trim (spaces only) and would otherwise add a phantom word
    n_words = F.size(
        F.filter(F.split(line, _LINE_WS), lambda w: F.length(w) > 0)
    )
    return (
        last.isin(*TERMINAL)
        & (n_words >= MIN_LINE_WORDS)
        & ~F.lower(line).contains("javascript")
    )


def _line_ok_sql(line: str) -> str:
    quoted = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in TERMINAL
    )
    return (
        f"(right({line}, 1) in ({quoted})"
        f" and len(list_filter(regexp_split_to_array({line}, "
        f"'{_LINE_WS}'), w -> len(w) > 0)) >= {MIN_LINE_WORDS}"
        f" and not contains(lower({line}), 'javascript'))"
    )


def c4_kept_lines_col(text: Column) -> Column:
    return F.filter(lines_col(text), _line_ok_col)


def c4_kept_lines_sql(text: str) -> str:
    return f"list_filter({lines_sql(text)}, l -> {_line_ok_sql('l')})"


def c4_clean_text_col(text: Column) -> Column:
    """The C4 transformation: qualifying lines rejoined with newlines
    ('' for a page with no qualifying line — never NULL, so downstream
    byte-compares and scrubbing behave like any other text)."""
    return F.array_join(c4_kept_lines_col(text), "\n")


def c4_clean_text_sql(text: str) -> str:
    # DuckDB array_to_string([]) is NULL where Spark array_join is ''
    return f"coalesce(array_to_string({c4_kept_lines_sql(text)}, chr(10)), '')"


def c4_kept_line_fraction_col(
    text: Column, lines: Column | None = None
) -> Column:
    """kept lines / non-empty lines (0.0 for line-less documents).
    ``lines`` lets the caller pass a materialized lines column (the
    split is referenced twice; see text.dup_line_fraction_col)."""
    if lines is None:
        lines = lines_col(text)
    n = F.size(lines)
    return F.when(
        n > 0,
        F.size(F.filter(lines, _line_ok_col)).cast("double")
        / n.cast("double"),
    ).otherwise(F.lit(0.0))


def c4_kept_line_fraction_sql(text: str) -> str:
    lines = lines_sql(text)
    return (
        f"case when len({lines}) > 0 then "
        f"cast(len(list_filter({lines}, l -> {_line_ok_sql('l')})) as double)"
        f" / cast(len({lines}) as double) else 0.0 end"
    )


def lorem_ipsum_col(text: Column) -> Column:
    return F.lower(F.coalesce(text, F.lit(""))).contains("lorem ipsum")


def lorem_ipsum_sql(text: str) -> str:
    return f"contains(lower(coalesce({text}, '')), 'lorem ipsum')"


def curly_brace_col(text: Column) -> Column:
    return F.coalesce(text, F.lit("")).contains("{")


def curly_brace_sql(text: str) -> str:
    return f"contains(coalesce({text}, ''), '{{')"
