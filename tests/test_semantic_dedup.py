"""SemDeDup-style semantic (embedding) dedup as a shipped stage (r5
verdict ask #5): exact-twin parity vs the DuckDB recursive-closure
oracle, LSH-path equivalence at high threshold, missing-embedding
semantics, plan shape (no cartesian in the scale path), and the CLI
composition (--dedup-semantic).

No reference counterpart (the reference has no embedding operators)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mysql_data_quality_spark.operators import dedup as D


def _unit(angle_deg: float, dim: int = 8) -> list[float]:
    """Unit vector in the (0,1)-plane at the given angle — cosine between
    two of them is cos(delta), so cluster geometry is exact by design."""
    a = math.radians(angle_deg)
    v = [0.0] * dim
    v[0], v[1] = math.cos(a), math.sin(a)
    return v


# clusters: {1,2,3} within ~6 deg (cos >= 0.994), {5,6} within 3 deg,
# 4 and 7 isolated (>= 45 deg from everything)
EMB_ROWS = [
    (1, _unit(0.0)), (2, _unit(3.0)), (3, _unit(6.0)),
    (4, _unit(60.0)),
    (5, _unit(120.0)), (6, _unit(123.0)),
    (7, _unit(240.0)),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, f"document number {i} text") for i in range(1, 9)],
        "doc_id: long, text: string",
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        EMB_ROWS, "doc_id: long, embedding: array<double>"
    )


class TestSemanticDedup:
    def test_exact_twin_matches_duckdb_oracle(self, spark, corpus, emb, tmp_path):
        import duckdb

        out = D.semantic_dedup_corpus(
            corpus, emb, "doc_id", threshold=0.99, exact=True
        )
        got = sorted(r["doc_id"] for r in out.collect())
        # doc 8 has no embedding -> kept; clusters keep 1 and 5
        assert got == [1, 4, 5, 7, 8]

        cdir, edir = str(tmp_path / "c"), str(tmp_path / "e")
        corpus.write.parquet(cdir)
        emb.write.parquet(edir)
        con = duckdb.connect()
        con.sql(f"create view corpus as select * from '{cdir}/*.parquet'")
        con.sql(f"create view emb as select * from '{edir}/*.parquet'")
        oracle = sorted(
            r[0]
            for r in con.sql(
                D.semantic_dedup_corpus_sql(
                    "corpus", "emb", "doc_id", 0.99
                )
            ).fetchall()
        )
        assert got == oracle

    def test_lsh_path_matches_exact_at_high_threshold(self, spark, corpus, emb):
        """The scale path (hyperplane LSH + exact re-rank) returns the
        SAME survivors as brute force here: recall at cosine 0.99 with
        4x24 tables is ~1-1e-9, and hyperplanes are seed-fixed, so this
        is deterministic, not flaky."""
        lsh = D.semantic_dedup_corpus(
            corpus, emb, "doc_id", threshold=0.99
        )
        exact = D.semantic_dedup_corpus(
            corpus, emb, "doc_id", threshold=0.99, exact=True
        )
        assert sorted(r["doc_id"] for r in lsh.collect()) == sorted(
            r["doc_id"] for r in exact.collect()
        )

    def test_star_edges_ok_when_buckets_pure(self, spark, corpus, emb):
        """ann star mode is an expert knob: with selective buckets
        (bits=12 on well-separated clusters) the bucket-min IS a cluster
        member and star survivors match all-pairs.  The impure-bucket
        failure mode (low bits -> verified star edges die -> under-merge)
        is documented on lsh_near_pairs and measured in BENCH.md."""
        star = D.semantic_dedup_corpus(
            corpus, emb, "doc_id", threshold=0.99, star_edges=True
        )
        exact = D.semantic_dedup_corpus(
            corpus, emb, "doc_id", threshold=0.99, exact=True
        )
        assert sorted(r["doc_id"] for r in star.collect()) == sorted(
            r["doc_id"] for r in exact.collect()
        )

    def test_no_embeddings_is_noop(self, spark, corpus):
        empty = spark.createDataFrame(
            [], "doc_id: long, embedding: array<double>"
        )
        out = D.semantic_dedup_corpus(corpus, empty, "doc_id")
        assert out.count() == corpus.count()

    def test_scale_path_plan_has_no_cartesian(self, spark, corpus, emb):
        from mysql_data_quality_spark.plans.compiler import formatted_plan

        df = D.semantic_dedup_corpus(
            corpus, emb, "doc_id", dim=8, threshold=0.99
        )
        p = formatted_plan(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestSemanticDedupCli:
    def test_cli_composed(self, spark, tmp_path, monkeypatch, capsys):
        from mysql_data_quality_spark import cli
        from tests.test_domains import GOOD

        monkeypatch.chdir(tmp_path)
        urls = [f"https://ex{i}.org/p" for i in range(1, 8)]
        pages = (
            spark.createDataFrame(
                [(u, GOOD + f" variant {i}") for i, u in enumerate(urls, 1)],
                "url: string, text: string",
            )
            .withColumn("lang", F.lit("en"))
            .withColumn("warc_ts", F.current_timestamp())
            .withColumn("html", F.lit(None).cast("binary"))
        )
        embp = spark.createDataFrame(
            [(urls[i - 1], v) for i, v in EMB_ROWS],
            "url: string, embedding: array<double>",
        )
        in_dir, emb_dir = str(tmp_path / "in"), str(tmp_path / "emb")
        pages.write.parquet(in_dir)
        embp.write.parquet(emb_dir)
        out = str(tmp_path / "out")
        rc = cli.main(
            ["filter", "--input", in_dir, "--output", out, "--buckets", "2",
             "--dedup-semantic", "0.99", "--semantic-embeddings", emb_dir]
        )
        assert rc == 0
        kept = {
            r["url"] for r in spark.read.parquet(f"{out}/data").collect()
        }
        # clusters {ex1,ex2,ex3} and {ex5,ex6} each keep their smallest url
        assert kept == {
            "https://ex1.org/p", "https://ex4.org/p",
            "https://ex5.org/p", "https://ex7.org/p",
        }

    def test_flag_requires_embeddings(self, tmp_path, capsys):
        from mysql_data_quality_spark import cli

        rc = cli.main(
            ["filter", "--input", str(tmp_path / "in"),
             "--output", str(tmp_path / "out"), "--dedup-semantic", "0.9"]
        )
        assert rc == 2
        assert "--semantic-embeddings" in capsys.readouterr().err
