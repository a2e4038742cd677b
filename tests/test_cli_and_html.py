"""CLI surface + HTML report tests (reference entry points 1/2 and S11)."""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_CORRECT


class TestHtmlReport:
    def test_html_written(self, spark, tmp_path):
        from mysql_data_quality_spark.pipeline import pages as P
        from mysql_data_quality_spark.pipeline import quality_filter as QF
        from mysql_data_quality_spark.reports.html_report import (
            write_html_report,
        )

        res = QF.metrics(QF.annotate(P.read_pages(spark, SF_CORRECT)))
        path = write_html_report(
            res, "pages", tmp_path, metadata={"sf": "0.01", "note": None}
        )
        text = path.read_text()
        assert "Data Quality Report — pages" in text
        assert "Quality score:" in text
        for sev in ("CRITICAL", "ERROR", "WARNING", "INFO"):
            assert f"<h2>{sev}</h2>" in text
        assert "toxicity_blocklist" in text
        # reference-parity structure (html_report.py:71-117,119-220):
        # summary cards, validator+severity breakdowns, per-result detail,
        # metadata footer with None -> N/A
        assert "Summary" in text and "class='cards'" in text
        assert "Validator Breakdown" in text
        assert "Severity Breakdown" in text
        assert "pass rate" in text and "class='details'" in text
        assert "Metadata: sf: 0.01, note: N/A" in text
        assert "Generated on" in text


class TestCli:
    """Drive the CLI in-process (the argparse surface is the contract;
    subprocess startup would just re-pay JVM boot per test)."""

    def test_parser_shapes(self):
        from mysql_data_quality_spark.cli import build_parser

        p = build_parser()
        a = p.parse_args(["validate", "/x.parquet", "--validators",
                          "completeness", "duplicates"])
        assert a.command == "validate" and a.validators == [
            "completeness", "duplicates"]
        a = p.parse_args(["filter", "--documents", "/d", "--output", "/o"])
        assert a.command == "filter"
        with pytest.raises(SystemExit):
            p.parse_args(["filter", "--output", "/o"])  # missing source

    def test_validate_command(self, spark, capsys):
        # reuses the session via getOrCreate inside the command
        from mysql_data_quality_spark import cli

        rc = cli.main(
            ["validate", f"{SF_CORRECT}/region.parquet",
             "--validators", "completeness"]
        )
        out = capsys.readouterr().out
        assert "region:" in out and "checks passed" in out
        assert rc == 0

    def test_analyze_command(self, spark, tmp_path, capsys):
        from mysql_data_quality_spark import cli

        rc = cli.main(
            ["analyze", f"{SF_CORRECT}/region.parquet",
             "--output-dir", str(tmp_path)]
        )
        assert rc == 0
        payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert payload["table"] == "region"
        assert payload["metadata"]["total_rows"] == 5
        assert (tmp_path / payload["reports"]["json"].split("/")[-1]).exists()

    def test_list_tables_command(self, spark, capsys):
        from mysql_data_quality_spark import cli

        rc = cli.main(["list-tables", SF_CORRECT])
        out = capsys.readouterr().out
        assert rc == 0
        lines = [line for line in out.splitlines() if line.strip()]
        assert len(lines) == 10
        # sorted by row count desc -> lineitem first
        assert lines[0].startswith("lineitem")


class TestCliFilter:
    def test_describe_table_command(self, spark, capsys):
        from mysql_data_quality_spark import cli

        rc = cli.main(["describe-table", f"{SF_CORRECT}/region.parquet"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Table: region" in out
        assert "Records: 5" in out
        assert "r_regionkey" in out and "int" in out
        assert "r_name" in out and "string" in out
        assert "nullable" in out

    def test_describe_table_command_jdbc(self, spark, tmp_path, capsys):
        from mysql_data_quality_spark import cli

        url = f"jdbc:derby:{tmp_path / 'ddb'};create=true"
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id: int, name: string"
        ).write.format("jdbc").option("url", url).option(
            "dbtable", "things"
        ).option(
            "driver", "org.apache.derby.jdbc.EmbeddedDriver"
        ).save()
        rc = cli.main(["describe-table", "things", "--jdbc-url", url])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Table: things" in out and "Records: 2" in out
        assert "ID" in out.upper() and "NAME" in out.upper()

    def test_test_connection_command(self, spark, tmp_path, capsys):
        """Reference cli.py:21-46 parity: a live probe that succeeds on a
        reachable database and reports failure (rc=1, no traceback) on an
        unreachable one."""
        from mysql_data_quality_spark import cli

        url = f"jdbc:derby:{tmp_path / 'cdb'};create=true"
        rc = cli.main(
            [
                "test-connection",
                "--url",
                url,
                "--probe-query",
                "SELECT 1 AS ok FROM SYSIBM.SYSDUMMY1",
            ]
        )
        out = capsys.readouterr().out
        assert rc == 0 and "Connection successful" in out

        rc = cli.main(
            ["test-connection", "--url", f"jdbc:derby:{tmp_path / 'nope'}"]
        )
        out = capsys.readouterr().out
        assert rc == 1 and "Connection failed" in out

    def test_test_connection_uses_db_env(self, monkeypatch, capsys):
        """Without --url the command targets the reference's DB_* env
        surface (DatabaseConfig), like reference load_config."""
        from mysql_data_quality_spark import cli
        from mysql_data_quality_spark.core.config import DatabaseConfig

        monkeypatch.setenv("DB_HOST", "db.internal")
        monkeypatch.setenv("DB_PORT", "3307")
        monkeypatch.setenv("DB_NAME", "crawl")
        monkeypatch.setenv("DB_USER", "qa")
        monkeypatch.setenv("DB_PASSWORD", "s3cret")
        db = DatabaseConfig.from_env()
        assert db.jdbc_url == "jdbc:mysql://db.internal:3307/crawl"
        assert db.jdbc_options == {"user": "qa", "password": "s3cret"}
        # no mysql server in the sandbox: the probe must FAIL cleanly
        # while showing it targeted the env-configured endpoint
        rc = cli.main(["test-connection"])
        out = capsys.readouterr().out
        assert rc == 1
        assert "mysql://db.internal:3307/crawl" in out
        assert "Connection failed" in out

    def test_read_jdbc_partition_bounds_validated(self, spark):
        """ADVICE r2: partition_column without explicit bounds used to
        send the literal string 'None' to the datasource."""
        from mysql_data_quality_spark.sources.registry import read_jdbc

        with pytest.raises(ValueError, match="lower_bound"):
            read_jdbc(
                spark, "jdbc:derby:memory:x", "t", partition_column="id"
            )

    def test_filter_command_end_to_end(self, spark, tmp_path, monkeypatch, capsys):
        """filter: env-driven rules + checkpointed write + metrics reports
        produced by observe() on the SAME write pass."""
        from mysql_data_quality_spark import cli
        from tests.conftest import SF_SMOKE

        monkeypatch.chdir(tmp_path)  # no stray .env
        monkeypatch.setenv("DQS_RULE_MIN_WORDS", "50")
        out_dir = str(tmp_path / "out")
        rc = cli.main(
            ["filter", "--documents", SF_SMOKE, "--output", out_dir,
             "--buckets", "4"]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["written"] == 4 and stats["input_scans"] == 1
        assert set(stats["metrics_reports"]) == {"json", "txt", "html"}
        dec = spark.read.parquet(f"{out_dir}/data")
        # stricter env threshold visibly changes decisions
        assert dec.where("drop_reason like '%min_words%'").count() > 0
        payload = json.loads(
            open(stats["metrics_reports"]["json"]).read()
        )
        by_rule = {r["rule_name"]: r for r in payload["results"]}
        assert by_rule["min_words"]["affected_rows"] == dec.where(
            "drop_reason like '%min_words%'"
        ).count()
        assert by_rule["keep_rate"]["total_rows"] == dec.count()

    def test_filter_dedup_end_to_end_matches_composed_oracle(
        self, spark, tmp_path, monkeypatch, capsys
    ):
        """filter --dedup: the end-to-end corpus pipeline (exact-dedup ->
        filter -> checkpointed write) in ONE resumable job, byte-compared
        against the DuckDB composition of the dedup and decision oracles."""
        import duckdb

        from mysql_data_quality_spark import cli
        from mysql_data_quality_spark.operators.dedup import (
            dedup_exact_corpus_sql,
        )
        from mysql_data_quality_spark.pipeline import pages as P
        from mysql_data_quality_spark.pipeline import quality_filter as QF
        from tests.conftest import SF_SMOKE

        monkeypatch.chdir(tmp_path)
        out_dir = str(tmp_path / "out")
        rc = cli.main(
            ["filter", "--documents", SF_SMOKE, "--output", out_dir,
             "--buckets", "4", "--dedup"]
        )
        assert rc == 0
        got = (
            spark.read.parquet(f"{out_dir}/data")
            .drop("bucket")
            .orderBy("url")
            .toPandas()
        )
        con = duckdb.connect()
        con.sql(
            "create view documents as "
            f"select * from '{SF_SMOKE}/documents.parquet'"
        )
        oracle = con.sql(
            "with pages as (" + P.pages_cte_sql() + "), pages_d as ("
            + dedup_exact_corpus_sql("pages", "url", "text") + ") "
            + QF.decisions_sql("pages_d") + " order by url"
        ).df()
        assert len(got) == len(oracle) > 0
        assert list(got.columns) == list(oracle.columns)
        for c in got.columns:
            assert (got[c].values == oracle[c].values).all(), c
        # sf0.001 has no exact-dup texts: dedup must be a no-op here
        assert len(got) == P.read_pages(spark, SF_SMOKE).count()
        # dedup effectiveness: re-run over a corpus with injected
        # duplicate texts (same text, different urls) via --input
        from pyspark.sql import functions as F

        pages = P.read_pages(spark, SF_SMOKE)
        dup_in = str(tmp_path / "dup_pages")
        pages.union(
            pages.limit(40).withColumn(
                "url", F.concat(F.lit("https://mirror.example/"), F.col("url"))
            )
        ).write.parquet(dup_in)
        dup_out = str(tmp_path / "dup_out")
        rc = cli.main(
            ["filter", "--input", dup_in, "--output", dup_out,
             "--buckets", "4", "--dedup"]
        )
        assert rc == 0
        n_dedup = spark.read.parquet(f"{dup_out}/data").count()
        assert n_dedup == pages.count()  # the 40 mirrors deduped away
        # resume is a no-op on the composed job too
        rc = cli.main(
            ["filter", "--documents", SF_SMOKE, "--output", out_dir,
             "--buckets", "4", "--dedup"]
        )
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and stats["written"] == 0 and stats["skipped"] == 4
