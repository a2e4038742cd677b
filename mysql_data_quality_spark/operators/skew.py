"""Skew-handling utilities (SURVEY.md §4.2 custom item 2; FIXTURES.md F6).

Common-Crawl-like corpora are domain-skewed: a few domains own half the
rows.  Any groupBy/join keyed on domain then has hot partitions.  Two
mitigations, both output-invariant:

  * :func:`with_salt` — deterministic salt column (pure function of the
    full row key, NOT random), so ``groupBy(domain, salt)`` splits a hot
    key into ``n_salts`` partial groups that a second tiny aggregation
    merges.  Determinism keeps north-rule byte-identity: the same row
    always lands in the same salted group.
  * AQE skew-join splitting is enabled globally in the session factory for
    the join case.

:func:`domain_col` extracts the grouping key the north rule talks about.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def domain_col(url: Column) -> Column:
    """https://{domain}/... -> domain (pure string ops, codegen-friendly)."""
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1)


def with_salt(
    df: DataFrame, row_key: str, n_salts: int = 8, salt_col: str = "_salt"
) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from the row's unique key
    (e.g. url) — never from rand(), so replays and resumes are stable."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.col(row_key), F.lit(1)), F.lit(n_salts)).cast("int"),
    )


def salted_group_count(
    df: DataFrame, group_col: str, row_key: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase skew-safe groupBy count: partial count per (key, salt),
    then merge.  Identical result to a direct groupBy().count(), but the
    first shuffle's hottest partition shrinks by ~n_salts."""
    salted = with_salt(df, row_key, n_salts)
    partial = salted.groupBy(group_col, "_salt").agg(
        F.count(F.lit(1)).alias("partial_n")
    )
    return partial.groupBy(group_col).agg(
        F.sum("partial_n").alias("n_rows")
    )
