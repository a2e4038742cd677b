"""Unicode normalization stage: NFC cross-engine parity (DuckDB
``nfc_normalize``), NFKC vs the CPython reference, control/zero-width
stripping, passthrough identity on clean text, zero-shuffle plan, and
the CLI pipeline stage vs the composed DuckDB oracle."""

from __future__ import annotations

import unicodedata

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_data_quality_spark.functions import normalize as N
from tests.conftest import SF_CORRECT

ROWS = [
    # genuinely decomposed (NFD) accents, built explicitly so the
    # vector cannot silently arrive pre-composed via file encoding
    (1, unicodedata.normalize("NFD", "\u00e9cole is d\u00e9compos\u00e9e")),
    (2, "already composed école"),
    (3, "zero​width‌chars‍ here﻿"),
    (4, "ctrl\x01\x02chars\x1f\x7f\x9dkept\ttab\nnl"),
    (5, None),
    (6, ""),
    (7, "ﬁne ﬂow ①②③ ﾊﾛｰ"),
    (8, "한국어"),  # Hangul jamo sequence
]


class TestNormalize:
    def _df(self, spark):
        return spark.createDataFrame(ROWS, "id: bigint, text: string")

    def test_nfc_vectors_and_duckdb_parity(self, spark):
        got = {
            r["id"]: r["t"]
            for r in self._df(spark)
            .select("id", N.normalized_text_col(F.col("text")).alias("t"))
            .collect()
        }
        # NFD accents compose; controls and zero-widths vanish (tab/nl kept)
        assert got[1] == "école is décomposée"
        assert got[3] == "zerowidthchars here"
        assert got[4] == "ctrlcharskept\ttab\nnl"
        # NFC does NOT fold compatibility chars (that's NFKC)
        assert got[7] == ROWS[6][1]
        assert got[5] is None and got[6] == ""
        duck = duckdb.connect()
        duck.register("t", pd.DataFrame(ROWS, columns=["id", "text"]))
        want = {
            r[0]: r[1]
            for r in duck.sql(
                f"select id, {N.normalized_text_sql('text')} from t"
            ).fetchall()
        }
        assert got == want

    def test_corpus_twin_parity(self, spark):
        got = {
            r["id"]: r["text"]
            for r in N.normalize_corpus(self._df(spark)).collect()
        }
        duck = duckdb.connect()
        duck.register("t", pd.DataFrame(ROWS, columns=["id", "text"]))
        want = {
            r[0]: r[1]
            for r in duck.sql(N.normalize_corpus_sql("t")).fetchall()
        }
        assert got == want

    def test_nfkc_matches_cpython_reference(self, spark):
        got = {
            r["id"]: r["t"]
            for r in self._df(spark)
            .select(
                "id",
                N.unicode_normalize_col(F.col("text"), "NFKC").alias("t"),
            )
            .collect()
        }
        for i, t in ROWS:
            exp = unicodedata.normalize("NFKC", t) if isinstance(t, str) else t
            assert got[i] == exp, i
        # the folds NFC must not do: ligature, circled digits, halfwidth
        assert got[7] == "fine flow 123 ハロー"

    def test_bad_form_raises(self, spark):
        with pytest.raises(ValueError):
            N.unicode_normalize_col(F.col("text"), "NFD")
        with pytest.raises(ValueError):
            N.normalize_corpus_sql("t", form="NFKC")

    def test_passthrough_identity_on_clean_corpus(self, spark):
        """The sf0.001 documents are ASCII-clean: normalization must be a
        byte-identical no-op on every row."""
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        before = {r["doc_id"]: r["text"] for r in docs.collect()}
        after = {
            r["doc_id"]: r["text"]
            for r in N.normalize_corpus(docs).collect()
        }
        assert before == after

    def test_plan_is_pure_map(self, spark):
        from mysql_data_quality_spark.plans.compiler import formatted_plan

        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        plan = formatted_plan(N.normalize_corpus(docs))
        assert "Exchange" not in plan  # zero shuffles at any scale
        assert "ArrowEvalPython" in plan  # the batched UDF boundary

    def test_cli_filter_normalize_text(
        self, spark, tmp_path, monkeypatch, capsys
    ):
        """filter --normalize-text nfc, byte-compared against the
        composed DuckDB oracle (nfc + strip, then decisions)."""
        from mysql_data_quality_spark import cli
        from mysql_data_quality_spark.pipeline import quality_filter as QF

        body = (
            "the quick brown fox jumps over the lazy dog near the "
            "résumé café every single morning at dawn."
        )
        rows = [
            ("u1", body),
            ("u2", "zero​width in an otherwise normal document "
                   "about spark plans and parquet row groups today."),
        ]
        pages = (
            spark.createDataFrame(rows, "url: string, text: string")
            .withColumn("lang", F.lit("en"))
            .withColumn("warc_ts", F.current_timestamp())
            .withColumn("html", F.lit(None).cast("binary"))
        )
        monkeypatch.chdir(tmp_path)
        src = str(tmp_path / "pages_in")
        pages.write.parquet(src)
        out_dir = str(tmp_path / "out")
        rc = cli.main(
            ["filter", "--input", src, "--output", out_dir,
             "--buckets", "2", "--normalize-text", "nfc"]
        )
        assert rc == 0
        got = (
            spark.read.parquet(f"{out_dir}/data")
            .drop("bucket")
            .orderBy("url")
            .toPandas()
        )
        con = duckdb.connect()
        con.sql(f"create view pages as select * from '{src}/*.parquet'")
        oracle = con.sql(
            "with corpus as ("
            + N.normalize_corpus_sql("pages")
            + ") "
            + QF.decisions_sql("corpus")
            + " order by url"
        ).df()
        assert list(got.columns) == list(oracle.columns)
        assert len(got) == len(oracle) == 2
        for c in got.columns:
            assert (got[c].values == oracle[c].values).all(), c
        # the shipped scrubbed text is the NORMALIZED text (composed
        # accents, zero-widths gone)
        texts = dict(zip(got.url, got.scrubbed_text))
        assert "́" not in texts["u1"] and "é" in texts["u1"]
        assert "​" not in texts["u2"]
