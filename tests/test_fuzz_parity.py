"""Randomized (seeded) fuzz parity: adversarial text through the full
pipeline must match the DuckDB oracle byte-for-byte — the randomized-testing
layer the reference lacks (SURVEY.md §5).

One Spark job over a few hundred generated documents: random unicode,
regex metacharacters, PII fragments, pathological whitespace, huge tokens.
"""

from __future__ import annotations

import random
import string

import duckdb
import pandas as pd
import pytest

from mysql_data_quality_spark.pipeline import quality_filter as QF

SEED = 1337


def _gen_texts(n: int = 300) -> list[str]:
    rng = random.Random(SEED)
    vocab = [
        "the", "data", "join", "über", "naïve", "文字", "🙂", "x@y.co",
        "(11) 91234-5678", "10.0.0.1", "badword1", "a" * 500, ".*+?[](){}|^$\\",
        "word-with-dash", "trailing.", "'quoted'", '"double"', "%", "_",
    ]
    out = []
    for _ in range(n):
        k = rng.randint(0, 60)
        toks = [rng.choice(vocab) for _ in range(k)]
        sep = rng.choice([" ", "  ", "\t", "\n", " \n "])
        text = sep.join(toks)
        if rng.random() < 0.1:
            text = " " + text + " "
        if rng.random() < 0.05:
            text = "".join(
                rng.choice(string.printable) for _ in range(rng.randint(0, 80))
            )
        out.append(text)
    return out


@pytest.fixture(scope="module")
def fuzz_pages(spark):
    texts = _gen_texts()
    rows = [
        (f"https://fuzz.example.com/{i}", t, "en" if i % 3 else "de")
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, "url: string, text: string, lang: string")


def test_fuzz_decisions_match_oracle(spark, fuzz_pages):
    dec = QF.decisions(fuzz_pages).orderBy("url").toPandas()
    pdf = fuzz_pages.orderBy("url").toPandas()
    con = duckdb.connect()
    con.register("pages", pdf)
    oracle = con.sql(QF.decisions_sql("pages") + " order by url").df()
    assert len(dec) == len(oracle) == 300
    for c in dec.columns:
        mism = (dec[c].values != oracle[c].values)
        assert not mism.any(), (
            f"{c}: first mismatch at "
            f"{dec['url'].values[mism.argmax()]}: "
            f"spark={dec[c].values[mism.argmax()]!r} "
            f"oracle={oracle[c].values[mism.argmax()]!r}"
        )


def test_fuzz_flat_hits_match_oracle(spark, fuzz_pages):
    fh = QF.flat_hits(fuzz_pages).orderBy("url").toPandas()
    pdf = fuzz_pages.orderBy("url").toPandas()
    con = duckdb.connect()
    con.register("pages", pdf)
    oracle = con.sql(QF.flat_hits_sql("pages") + " order by url").df()
    for c in fh.columns:
        assert (fh[c].values == oracle[c].values).all(), c
