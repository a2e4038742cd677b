"""URL domain-blocklist filtering: suffix-match semantics, DuckDB exact
parity, label-cap behavior, zero corpus shuffles, text/parquet loaders,
and the CLI admission stage vs the composed DuckDB oracle."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from mysql_data_quality_spark.operators import blocklist as B
from tests.conftest import SF_CORRECT

CORPUS = [
    ("https://ads.example.com/banner", "x"),
    ("https://example.com/page", "x"),
    ("https://sub.deep.tracker.net:8080/p?q=1", "x"),
    ("https://good.org/fine", "x"),
    ("http://TRACKER.net/upper", "x"),
    ("not a url at all", "x"),
    (None, "x"),
    ("https://a.b.c.d.e.f.g.h.i.j.evil.com/deep", "x"),  # 12 labels
    ("https://notexample.com/lookalike", "x"),  # suffix, not substring
    ("http://evil.com./rooted", "x"),  # absolute FQDN (trailing dot)
]
BL = [("example.com",), ("  Tracker.NET ",), ("",), ("evil.com",),
      ("rooted.org.",)]  # FQDN-spelled entry must match plain hosts
CORPUS.append(("https://sub.rooted.org/x", "x"))


class TestBlocklist:
    def _frames(self, spark):
        return (
            spark.createDataFrame(CORPUS, "url: string, text: string"),
            spark.createDataFrame(BL, "domain: string"),
        )

    def test_suffix_semantics(self, spark):
        corpus, bl = self._frames(spark)
        flagged = {
            r["url"]: r["matched_domain"]
            for r in B.blocklisted_urls(corpus, bl).collect()
        }
        # exact host and subdomains match; case/port/whitespace handled
        assert flagged["https://example.com/page"] == "example.com"
        assert flagged["https://ads.example.com/banner"] == "example.com"
        assert flagged["http://TRACKER.net/upper"] == "tracker.net"
        assert (
            flagged["https://sub.deep.tracker.net:8080/p?q=1"]
            == "tracker.net"
        )
        # the 8-label cap keeps the SHORT suffixes (registrable domain is
        # at the end), so a 12-label host still matches evil.com
        assert (
            flagged["https://a.b.c.d.e.f.g.h.i.j.evil.com/deep"]
            == "evil.com"
        )
        # suffix match is on dot boundaries, never substring
        assert "https://notexample.com/lookalike" not in flagged
        assert "https://good.org/fine" not in flagged
        # r5 review: a trailing root-label dot must not evade the block
        assert flagged["http://evil.com./rooted"] == "evil.com"
        # ...and an FQDN-SPELLED blocklist entry matches plain hosts
        assert flagged["https://sub.rooted.org/x"] == "rooted.org"
        kept = {r["url"] for r in B.blocklist_filtered_corpus(corpus, bl).collect()}
        assert kept == {
            "https://good.org/fine", "not a url at all",
            "https://notexample.com/lookalike", None,
        }

    def test_duckdb_exact_parity(self, spark):
        corpus, bl = self._frames(spark)
        duck = duckdb.connect()
        duck.register("c", pd.DataFrame(CORPUS, columns=["url", "text"]))
        duck.register("b", pd.DataFrame(BL, columns=["domain"]))
        got = {
            r["url"]: r["matched_domain"]
            for r in B.blocklisted_urls(corpus, bl).collect()
        }
        want = {
            r[0]: r[1]
            for r in duck.sql(B.blocklisted_urls_sql("c", "b")).fetchall()
        }
        assert got == want
        kept = sorted(
            (r["url"] or "<NULL>")
            for r in B.blocklist_filtered_corpus(corpus, bl).collect()
        )
        want_kept = sorted(
            (r[0] or "<NULL>")
            for r in duck.sql(
                B.blocklist_filtered_corpus_sql("c", "b")
            ).fetchall()
        )
        assert kept == want_kept

    def test_corpus_never_shuffles(self, spark):
        import re

        from mysql_data_quality_spark.plans.compiler import formatted_plan

        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        pages = docs.select(
            F.concat(F.lit("https://example.com/"), "doc_id").alias("url"),
            "text",
        )
        bl = spark.createDataFrame([("example.org",)], "domain: string")
        plan = formatted_plan(B.blocklist_filtered_corpus(pages, bl))
        blocks = re.split(r"\n\n", plan)
        for b in blocks:
            if re.match(r"\(\d+\) Exchange", b.strip()):
                assert not re.search(r"\btext#", b), b

    def test_read_blocklist_text_and_parquet(self, spark, tmp_path):
        txt = tmp_path / "ut1_domains"
        txt.write_text("# adult list\nexample.com\n\n  tracker.net  \n")
        got = {
            r["domain"] for r in B.read_blocklist(spark, str(txt)).collect()
        }
        assert got == {"example.com", "tracker.net"}
        pq = str(tmp_path / "bl.parquet")
        spark.createDataFrame(BL, "domain: string").write.parquet(pq)
        got2 = B.read_blocklist(spark, pq)
        assert got2.columns == ["domain"] and got2.count() == len(BL)

    def test_cli_filter_blocklist(
        self, spark, tmp_path, monkeypatch, capsys
    ):
        """filter --blocklist: admission control before the rules,
        byte-compared against the composed DuckDB oracle."""
        from mysql_data_quality_spark import cli
        from mysql_data_quality_spark.pipeline import quality_filter as QF

        body = (
            "the quick brown fox jumps over the lazy dog near the "
            "river bank every single morning without fail at dawn."
        )
        rows = [
            ("https://spam.example.com/a", body),
            ("https://fine.org/b", body + " second page variant text."),
            ("https://fine.org/c", "a standalone page about row groups."),
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
        blf = tmp_path / "domains"
        blf.write_text("example.com\n")
        out_dir = str(tmp_path / "out")
        rc = cli.main(
            ["filter", "--input", src, "--output", out_dir,
             "--buckets", "2", "--blocklist", str(blf)]
        )
        assert rc == 0
        got = (
            spark.read.parquet(f"{out_dir}/data")
            .drop("bucket")
            .orderBy("url")
            .toPandas()
        )
        assert set(got.url) == {"https://fine.org/b", "https://fine.org/c"}
        con = duckdb.connect()
        con.sql(f"create view pages as select * from '{src}/*.parquet'")
        con.sql("create view bl as select 'example.com' as domain")
        oracle = con.sql(
            "with corpus as ("
            + B.blocklist_filtered_corpus_sql("pages", "bl")
            + ") "
            + QF.decisions_sql("corpus")
            + " order by url"
        ).df()
        assert list(got.columns) == list(oracle.columns)
        assert len(got) == len(oracle)
        for c in got.columns:
            assert (got[c].values == oracle[c].values).all(), c
