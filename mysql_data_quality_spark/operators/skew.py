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
    """https://{domain}/... -> domain — alias of
    :func:`mysql_data_quality_spark.functions.urls.url_host_col` so the
    repo has ONE domain extractor (lowercased, port stripped, userinfo
    skipped); two subtly-different keys would silently split sites
    across salting and stats (r4 review)."""
    from mysql_data_quality_spark.functions.urls import url_host_col

    return url_host_col(url)


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


def domain_stats(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(domain, n_docs, total_chars): per-site corpus profile — the
    first report a crawl-pipeline operator pulls (which sites dominate,
    where the bytes are).

    Deliberately a PLAIN groupBy, not a salted two-phase: count/sum are
    map-combinable, so hash aggregation ships at most one partial row
    per (domain, map task) into the reducer — a hot domain cannot pin a
    reducer and salting would only add a second shuffle for identical
    output (r4 review).  Salting earns its keep for NON-combinable
    aggregates (collect_list/exact-distinct) — that path is
    :func:`salted_group_count`/:func:`with_salt`."""
    from mysql_data_quality_spark.functions.urls import url_host_col

    return (
        pages.select(
            url_host_col(F.col(url_col)).alias("domain"),
            F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_chars"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_chars").alias("total_chars"),
        )
    )


def domain_stats_sql(rel: str, url_col: str = "url",
                     text_col: str = "text") -> str:
    from mysql_data_quality_spark.functions.urls import url_host_sql

    return f"""
select {url_host_sql(url_col)} as domain,
       count(*) as n_docs,
       cast(sum(length(coalesce({text_col}, ''))) as bigint) as total_chars
from {rel}
group by 1
"""
