"""Replicates the driver's correctness gate: every ``queries()`` entry runs
on Spark at sf0.01 and must match its ``oracle_sql()`` on row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math

import pandas as pd
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_CORRECT

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_CORRECT).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check
        return
    odf = duck.sql(ORACLES[name]).df()
    assert list(sorted(sdf.columns)) == list(sorted(odf.columns)), name
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)}"
    a, b = _canon(sdf), _canon(odf)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == "f":
            assert all(
                (math.isnan(x) and math.isnan(y)) or x == y
                for x, y in zip(av, bv)
            ), f"{name}.{c}"
        else:
            assert (av == bv).all(), f"{name}.{c}"


def test_gate_is_exactly_50_fully_oracled():
    """The driver gate records at most 50 rows in dict order (observed
    r4: 53 declared -> 50 recorded).  Pin the contract: exactly 50
    declared queries, every one with an oracle — so the gate, the entry
    file, and BASELINE.md can never drift apart again (r4 verdict ask
    #2)."""
    assert len(QUERIES) == 50
    assert set(QUERIES) == set(ORACLES)


RETIRED = {
    # r6 gate rotation: slots freed for first-time-gated training-data
    # operators; the retired queries keep the IDENTICAL sf0.01 compare
    # here (same contract as dedup_corpus_newest_docs below)
    "dup_value_counts": (
        entry._dup_value_counts, entry._dup_value_counts_sql
    ),
    "nation_keys_union": (
        entry._nation_keys_union, entry._nation_keys_union_sql
    ),
    "user_event_ranks": (
        entry._user_event_ranks, entry._user_event_ranks_sql
    ),
    "part_brand_stats": (
        entry._part_brand_stats, entry._part_brand_stats_sql
    ),
    "pivot_order_priority": (
        entry._pivot_order_priority, entry._pivot_order_priority_sql
    ),
}


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_gate_parity(spark, duck, name):
    fn, sql = RETIRED[name]
    sdf = fn(spark, SF_CORRECT).toPandas()
    odf = duck.sql(sql()).df()
    assert list(sorted(sdf.columns)) == list(sorted(odf.columns)), name
    assert len(sdf) == len(odf) > 0, name
    a, b = _canon(sdf), _canon(odf)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == "f":
            assert all(
                (math.isnan(x) and math.isnan(y)) or x == y
                for x, y in zip(av, bv)
            ), f"{name}.{c}"
        else:
            assert (av == bv).all(), f"{name}.{c}"


def test_retired_never_overlap_gate():
    assert not set(RETIRED) & set(QUERIES)


def test_newest_dedup_offgate_parity(spark, duck):
    """keep='newest' (re-crawl policy) under the SAME sf0.01 hash
    compare as the gate rows — kept OFF the registered dict only because
    the driver records at most 50 entries (see queries() comment)."""
    import __spark_entry__ as entry

    got = (
        entry._dedup_corpus_newest_docs(spark, SF_CORRECT)
        .orderBy("doc_id")
        .toPandas()
    )
    want = duck.sql(
        entry._dedup_corpus_newest_docs_sql() + " order by doc_id"
    ).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 0
    assert (got["doc_id"].values == want["doc_id"].values).all()
    # Spark returns tz-aware (session tz), DuckDB's to_timestamp is
    # TIMESTAMPTZ — normalize both to UTC-naive µs before comparing
    def _us(s):
        return (
            pd.to_datetime(s, utc=True)
            .dt.tz_localize(None)
            .astype("datetime64[us]")
            .values
        )

    assert (_us(got["ts"]) == _us(want["ts"])).all()
    # the policy discriminates: every variant pair's NEWER copy won,
    # so some surviving ids are variant ids (base + 1000000)
    assert (got["doc_id"] >= 1000000).any()
    assert (got["doc_id"] < 1000000).any()


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"url", "keep", "drop_reason", "scrubbed_text"}
