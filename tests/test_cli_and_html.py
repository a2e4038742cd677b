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
        path = write_html_report(res, "pages", tmp_path)
        text = path.read_text()
        assert "Data Quality Report — pages" in text
        assert "Quality score:" in text
        for sev in ("CRITICAL", "ERROR", "WARNING", "INFO"):
            assert f"<h2>{sev}</h2>" in text
        assert "toxicity_blocklist" in text


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
