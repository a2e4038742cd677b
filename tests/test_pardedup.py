"""Corpus-wide paragraph-level dedup (CCNet/RefinedWeb stage): hand
vectors, DuckDB exact parity on every flag combination, boilerplate
injection at sf0.001, partition invariance, and the CLI pipeline stage
vs the composed DuckDB oracle."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_data_quality_spark.operators import pardedup
from tests.conftest import SF_CORRECT

ROWS = [
    (1, "Shared boilerplate para.\n\nUnique one here."),
    (2, "Another doc intro.\n\nShared boilerplate para.\n\nTail text."),
    (3, "Shared boilerplate para."),
    (4, "Repeat me.\n\nRepeat me.\n\nRepeat me."),
    (5, None),
    (6, ""),
    (7, "  Shared boilerplate para.  \r\n\r\nCRLF unique."),
    (8, "SHARED BOILERPLATE PARA.\n\nCase variant doc."),
]


class TestParagraphDedup:
    def _df(self, spark):
        return spark.createDataFrame(ROWS, "doc_id: bigint, text: string")

    def test_semantics(self, spark):
        got = {
            r["doc_id"]: r["text"]
            for r in pardedup.paragraph_dedup_corpus(self._df(spark)).collect()
        }
        # first occurrence (doc 1) keeps the shared paragraph
        assert got[1] == "Shared boilerplate para.\n\nUnique one here."
        # later docs lose it and are rebuilt from kept paragraphs
        assert got[2] == "Another doc intro.\n\nTail text."
        # a doc that was ONLY the boilerplate becomes empty
        assert got[3] == ""
        # within-doc repeats collapse to the first instance
        assert got[4] == "Repeat me."
        # null / empty pass through byte-identical
        assert got[5] is None and got[6] == ""
        # trimming + CRLF: whitespace variants are the same paragraph
        assert got[7] == "CRLF unique."
        # casing differs -> different paragraph (exact mode)
        assert got[8] == "SHARED BOILERPLATE PARA.\n\nCase variant doc."

    def test_casefold_and_drop_empty(self, spark):
        got = {
            r["doc_id"]: r["text"]
            for r in pardedup.paragraph_dedup_corpus(
                self._df(spark), casefold=True, drop_empty=True
            ).collect()
        }
        assert got[8] == "Case variant doc."  # case variant now dedups
        assert 3 not in got and 5 not in got and 6 not in got

    @pytest.mark.parametrize("casefold", [False, True])
    @pytest.mark.parametrize("drop_empty", [False, True])
    def test_duckdb_exact_parity(self, spark, casefold, drop_empty):
        got = {
            r["doc_id"]: r["text"]
            for r in pardedup.paragraph_dedup_corpus(
                self._df(spark), casefold=casefold, drop_empty=drop_empty
            ).collect()
        }
        duck = duckdb.connect()
        duck.register("t", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
        want = {
            r[0]: r[1]
            for r in duck.sql(
                pardedup.paragraph_dedup_corpus_sql(
                    "t", casefold=casefold, drop_empty=drop_empty
                )
            ).fetchall()
        }
        assert got == want

    def test_sf0001_boilerplate_injection_parity(self, spark, duck, tmp_path):
        """Prepend a cookie-banner paragraph to every even doc_id of the
        real sf0.001 documents table: it must survive on exactly one
        document, all other columns pass through, and DuckDB agrees on
        every rebuilt text byte."""
        banner = (
            "This site uses cookies. By continuing you accept our "
            "cookie policy and terms of service."
        )
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        injected = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit(banner + "\n\n"), F.coalesce("text", F.lit(""))),
            ).otherwise(F.col("text")),
        )
        path = str(tmp_path / "injected")
        injected.write.parquet(path)
        out = pardedup.paragraph_dedup_corpus(
            spark.read.parquet(path)
        ).orderBy("doc_id")
        pdf = out.toPandas()
        survivors = pdf["text"].fillna("").str.contains(
            "This site uses cookies", regex=False
        )
        assert survivors.sum() == 1
        assert pdf.loc[survivors, "doc_id"].iloc[0] == min(
            i for i, in spark.read.parquet(path)
            .where(F.col("doc_id") % 2 == 0).select("doc_id").collect()
        )
        con = duckdb.connect()
        con.sql(
            f"create view inj as select * from '{path}/*.parquet'"
        )
        want = con.sql(
            pardedup.paragraph_dedup_corpus_sql("inj") + " order by doc_id"
        ).df()
        assert list(pdf.columns) == list(want.columns)
        for c in pdf.columns:
            a, b = pdf[c].fillna("<N>"), want[c].fillna("<N>")
            assert (a.values == b.values).all(), c

    def test_partition_invariance(self, spark):
        base = pardedup.paragraph_dedup_corpus(self._df(spark))
        wide = pardedup.paragraph_dedup_corpus(
            self._df(spark).repartition(13)
        )
        a = {(r["doc_id"], r["text"]) for r in base.collect()}
        b = {(r["doc_id"], r["text"]) for r in wide.collect()}
        assert a == b

    def test_cli_filter_dedup_paragraph(
        self, spark, tmp_path, monkeypatch, capsys
    ):
        """filter --dedup-paragraph: pardedup (drop_empty) -> decisions,
        byte-compared against the composed DuckDB oracle."""
        from mysql_data_quality_spark import cli
        from mysql_data_quality_spark.pipeline import quality_filter as QF

        banner = (
            "Accept all cookies to continue reading this very fine "
            "website today and forever after."
        )
        body_a = (
            "the quick brown fox jumps over the lazy dog near the "
            "river bank every single morning without fail at dawn."
        )
        body_b = (
            "spark compiles declarative plans into whole stage codegen "
            "with partial aggregation pushed below every shuffle edge."
        )
        rows = [
            ("u1", f"{banner}\n\n{body_a}"),
            ("u2", f"{banner}\n\n{body_b}"),
            ("u3", banner),
            ("u4", "a fully standalone page about parquet row groups."),
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
             "--buckets", "2", "--dedup-paragraph"]
        )
        assert rc == 0
        got = (
            spark.read.parquet(f"{out_dir}/data")
            .drop("bucket")
            .orderBy("url")
            .toPandas()
        )
        # u3 lost its only paragraph -> dropped before the filter
        assert set(got.url) == {"u1", "u2", "u4"}
        con = duckdb.connect()
        con.sql(f"create view pages as select * from '{src}/*.parquet'")
        dedup = pardedup.paragraph_dedup_corpus_sql(
            "pages", id_col="url", drop_empty=True
        )
        oracle = con.sql(
            f"with corpus as ({dedup}) "
            + QF.decisions_sql("corpus")
            + " order by url"
        ).df()
        assert list(got.columns) == list(oracle.columns)
        assert len(got) == len(oracle)
        for c in got.columns:
            assert (got[c].values == oracle[c].values).all(), c


class TestDedupLines:
    """Within-document repeated-line removal (RefinedWeb line-wise
    correction) — functions/text.py::dedup_lines_col."""

    ROWS = [
        (1, "Home\nAbout\nHome\nContact\nhome"),   # case-sensitive keep
        (2, "nav\n\nnav\n  nav  \nbody text"),     # ws-variants collapse
        (3, None),
        (4, ""),
        (5, "only\n\n\nblank\n\nlines\n\nkept"),   # blanks all survive
        (6, "a\r\nb\r\na\r\nc"),                   # CRLF split
        (7, "x"),
    ]

    def test_semantics_and_duckdb_parity(self, spark):
        import duckdb
        import pandas as pd
        from pyspark.sql import functions as F

        from mysql_data_quality_spark.functions import text as T

        df = spark.createDataFrame(self.ROWS, "id: bigint, text: string")
        got = {
            r["id"]: r["t"]
            for r in df.select(
                "id", T.dedup_lines_col(F.col("text")).alias("t")
            ).collect()
        }
        assert got[1] == "Home\nAbout\nContact\nhome"
        assert got[2] == "nav\n\nbody text"
        assert got[3] is None and got[4] == ""
        assert got[5] == self.ROWS[4][1]  # nothing repeats -> unchanged
        assert got[6] == "a\nb\nc"
        duck = duckdb.connect()
        duck.register("t", pd.DataFrame(self.ROWS, columns=["id", "text"]))
        want = {
            r[0]: r[1]
            for r in duck.sql(
                f"select id, {T.dedup_lines_sql('text')} from t"
            ).fetchall()
        }
        assert got == want

    def test_cli_filter_dedup_lines(
        self, spark, tmp_path, monkeypatch, capsys
    ):
        import duckdb
        from pyspark.sql import functions as F

        from mysql_data_quality_spark import cli
        from mysql_data_quality_spark.functions import text as T
        from mysql_data_quality_spark.pipeline import quality_filter as QF

        nav = "home about contact login"
        rows = [
            ("u1", f"{nav}\nthe quick brown fox jumps over the lazy "
                   f"dog near the river bank at dawn.\n{nav}"),
            ("u2", "a standalone page about parquet row groups today."),
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
             "--buckets", "2", "--dedup-lines"]
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
            "with corpus as (select * replace ("
            + T.dedup_lines_sql("text")
            + " as text) from pages) "
            + QF.decisions_sql("corpus")
            + " order by url"
        ).df()
        assert list(got.columns) == list(oracle.columns)
        assert len(got) == len(oracle) == 2
        for c in got.columns:
            assert (got[c].values == oracle[c].values).all(), c
        # the second nav line is gone from the shipped text
        texts = dict(zip(got.url, got.scrubbed_text))
        assert texts["u1"].count(nav) == 1
