"""Kitchen-sink integration: every deterministic corpus-cleanup stage in
ONE cli filter run — admission blocklist → Unicode normalization →
line dedup → exact dedup → paragraph dedup → decontamination →
decisions — byte-compared against the single composed DuckDB oracle
built from each stage's SQL twin in the same order.

Also pins the stage-ordering interplay the flags promise: two documents
that become byte-equal only AFTER normalization + line-cleanup must be
caught by the exact-dedup stage."""

from __future__ import annotations

import unicodedata

import duckdb
from pyspark.sql import functions as F

from mysql_data_quality_spark.functions import normalize as N
from mysql_data_quality_spark.functions import text as T
from mysql_data_quality_spark.operators import blocklist as B
from mysql_data_quality_spark.operators import pardedup
from mysql_data_quality_spark.operators.decontaminate import (
    decontaminated_corpus_sql,
)
from mysql_data_quality_spark.operators.dedup import dedup_exact_corpus_sql
from mysql_data_quality_spark.pipeline import quality_filter as QF

EV_GRAM = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu"
)  # exactly 13 tokens — one eval n-gram at the default size


class TestComposedPipeline:
    def _pages(self, spark):
        nav = "home about contact login"
        banner = (
            "Accept all cookies to continue reading this very fine "
            "website today and forever after."
        )
        body1 = (
            "the quick brown fox jumps over the lazy dog near the "
            "river bank every single morning without fail at dawn."
        )
        body2 = (
            "spark compiles declarative plans into whole stage codegen "
            "with partial aggregation pushed below every shuffle edge."
        )
        body3 = "a page about café résumés and parquet row groups."
        body4 = "completely standalone body text about bloom filters."
        rows = [
            # blocked at admission (never pays any later stage)
            ("https://spam.bad.com/x", "junk " * 20),
            # shared banner paragraph: first url keeps it, second loses it
            ("https://a.org/1", f"{banner}\n\n{body1}"),
            ("https://a.org/2", f"{banner}\n\n{body2}"),
            # NFD + zero-width variant of u4's exact text: byte-equal
            # only AFTER normalization -> exact dedup must catch it
            ("https://a.org/3",
             unicodedata.normalize("NFD", body3) + "​"),
            ("https://a.org/4", body3),
            # repeated nav line: cleaned u5 == u6 -> exact dedup
            ("https://a.org/5", f"{nav}\n{body4}\n{nav}"),
            ("https://a.org/6", f"{nav}\n{body4}"),
            # carries a verbatim eval 13-gram -> decontaminated
            ("https://a.org/7",
             f"an otherwise fine document but {EV_GRAM} leaks here."),
            ("https://a.org/8",
             "a fully standalone page about parquet footers today."),
        ]
        return (
            spark.createDataFrame(rows, "url: string, text: string")
            .withColumn("lang", F.lit("en"))
            .withColumn("warc_ts", F.current_timestamp())
            .withColumn("html", F.lit(None).cast("binary"))
        )

    def test_all_stages_match_composed_oracle(
        self, spark, tmp_path, monkeypatch, capsys
    ):
        from mysql_data_quality_spark import cli

        monkeypatch.chdir(tmp_path)
        src = str(tmp_path / "pages_in")
        self._pages(spark).write.parquet(src)
        ev = str(tmp_path / "eval_set")
        spark.createDataFrame(
            [(EV_GRAM,)], "text: string"
        ).write.parquet(ev)
        blf = tmp_path / "domains"
        blf.write_text("# blocklist\nbad.com\n")
        out_dir = str(tmp_path / "out")
        rc = cli.main(
            ["filter", "--input", src, "--output", out_dir,
             "--buckets", "2",
             "--blocklist", str(blf),
             "--normalize-text", "nfc",
             "--dedup-lines",
             "--dedup",
             "--dedup-paragraph",
             "--decontaminate", ev]
        )
        assert rc == 0
        got = (
            spark.read.parquet(f"{out_dir}/data")
            .drop("bucket")
            .orderBy("url")
            .toPandas()
        )
        # the survivors the stage semantics dictate:
        #   blocked: spam.bad.com | exact dups after cleanup: u4, u6
        #   contaminated: u7     | banner lives once (u1), cut from u2
        assert set(got.url) == {
            "https://a.org/1", "https://a.org/2", "https://a.org/3",
            "https://a.org/5", "https://a.org/8",
        }
        con = duckdb.connect()
        con.sql(f"create view pages as select * from '{src}/*.parquet'")
        con.sql(f"create view ev as select * from '{ev}/*.parquet'")
        con.sql("create view bl as select 'bad.com' as domain")
        oracle = con.sql(
            "with "
            f"s1 as ({B.blocklist_filtered_corpus_sql('pages', 'bl')}), "
            f"s2 as ({N.normalize_corpus_sql('s1')}), "
            f"s3 as (select * replace ({T.dedup_lines_sql('text')} as "
            "text) from s2), "
            f"s4 as ({dedup_exact_corpus_sql('s3', id_col='url')}), "
            f"s5 as ({pardedup.paragraph_dedup_corpus_sql('s4', id_col='url', drop_empty=True)}), "
            f"s6 as ({decontaminated_corpus_sql('s5', 'ev', corpus_id='url')}) "
            + QF.decisions_sql("s6")
            + " order by url"
        ).df()
        assert list(got.columns) == list(oracle.columns)
        assert len(got) == len(oracle)
        for c in got.columns:
            assert (got[c].values == oracle[c].values).all(), c
        # ordering interplay: the banner survives exactly once and the
        # scrubbed text of u3 is the NORMALIZED, zero-width-free form
        texts = dict(zip(got.url, got.scrubbed_text))
        assert sum("Accept all cookies" in t for t in texts.values()) == 1
        assert "​" not in texts["https://a.org/3"]
        assert "́" not in texts["https://a.org/3"]  # composed é
