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


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"url", "keep", "drop_reason", "scrubbed_text"}
