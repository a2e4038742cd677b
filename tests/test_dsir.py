"""DSIR importance resampling (Xie et al. 2023 recipe, original Spark
implementation): cross-engine hashed-ngram feature parity (exact —
integer buckets), score parity vs the DuckDB twin (approx — ln() is
libm-dependent), selection semantics (target-like docs oversampled,
determinism, rate calibration), the guards, and the CLI stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_data_quality_spark.operators import dsir

IN_DOMAIN = [
    "the spark engine compiles the query plan into stages",
    "a query plan shuffles data between stages of the engine",
    "stages of a spark plan exchange shuffle data",
]
OFF_DOMAIN = [
    "grandma's lemon cake recipe needs three fresh eggs",
    "whisk the eggs with sugar and lemon zest gently",
    "bake the cake until the kitchen smells of lemon",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t) for i, t in enumerate(IN_DOMAIN * 4 + OFF_DOMAIN * 4)]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


@pytest.fixture(scope="module")
def target(spark):
    rows = [(100 + i, t) for i, t in enumerate(IN_DOMAIN)]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


class TestFeatures:
    def test_bucket_parity_exact(self, spark, duck):
        """The hashed features are md5-family integers: DuckDB computes
        the IDENTICAL bucket arrays (the float-free half of the oracle)."""
        got = {
            r["doc_id"]: r["b"]
            for r in spark.read.parquet(
                "/root/testdata/sf0.01/documents.parquet"
            )
            .select(
                "doc_id",
                dsir.hashed_ngram_buckets(F.col("text")).alias("b"),
            )
            .collect()
        }
        want = {
            r[0]: r[1]
            for r in duck.sql(
                "select doc_id, "
                + dsir.hashed_ngram_buckets_sql("text")
                + " from documents"
            ).fetchall()
        }
        assert got == want

    def test_unigram_plus_bigram_counts(self, spark):
        out = spark.createDataFrame(
            [(1, "a b c"), (2, "one"), (3, None)], "doc_id: long, text: string"
        ).select(
            F.size(dsir.hashed_ngram_buckets(F.col("text"))).alias("n")
        ).collect()
        assert [r["n"] for r in out] == [5, 1, 0]  # 3 uni + 2 bi; 1; 0


class TestScores:
    def test_score_parity_vs_duckdb(self, spark, corpus, target, tmp_path):
        import duckdb

        ratios = dsir.dsir_log_ratios(corpus, target)
        got = {
            r["doc_id"]: r["dsir_score"]
            for r in dsir.dsir_scores(corpus, ratios, "doc_id").collect()
        }
        cdir, tdir = str(tmp_path / "c"), str(tmp_path / "t")
        corpus.write.parquet(cdir)
        target.write.parquet(tdir)
        con = duckdb.connect()
        con.sql(f"create view c as select * from '{cdir}/*.parquet'")
        con.sql(f"create view t as select * from '{tdir}/*.parquet'")
        want = {
            r[0]: r[1]
            for r in con.sql(
                dsir.dsir_scores_sql("c", "t", "doc_id")
            ).fetchall()
        }
        assert set(got) == set(want)
        for k in got:
            assert got[k] == pytest.approx(want[k], rel=1e-9), k

    def test_target_like_scores_higher(self, spark, corpus, target):
        ratios = dsir.dsir_log_ratios(corpus, target)
        rows = dsir.dsir_scores(corpus, ratios, "doc_id").collect()
        in_scores = [r["dsir_score"] for r in rows if r["doc_id"] < 12]
        off_scores = [r["dsir_score"] for r in rows if r["doc_id"] >= 12]
        assert min(in_scores) > max(off_scores)


class TestResample:
    def test_oversamples_target_like_and_deterministic(
        self, spark, corpus, target
    ):
        out = dsir.dsir_resample(
            corpus, target, "doc_id", rate=0.5, temperature=0.5
        )
        kept = sorted(r["doc_id"] for r in out.collect())
        in_kept = sum(1 for d in kept if d < 12)
        off_kept = sum(1 for d in kept if d >= 12)
        # measured (deterministic by construction): 11 of 12 in-domain
        # vs 3 of 12 off-domain at rate 0.5, temperature 0.5
        assert in_kept >= 10 and off_kept <= 5
        assert in_kept > 2 * off_kept
        # pure function of ids: re-running keeps the same rows
        again = sorted(
            r["doc_id"]
            for r in dsir.dsir_resample(
                corpus, target, "doc_id", rate=0.5, temperature=0.5
            ).collect()
        )
        assert kept == again

    def test_high_temperature_flattens(self, spark, corpus, target):
        """temperature -> inf drives every weight to 1: the stage
        degenerates to a plain hash sample at ``rate``."""
        out = dsir.dsir_resample(
            corpus, target, "doc_id", rate=1.0, temperature=1e9
        )
        assert out.count() == corpus.count()

    def test_sampled_raw_histogram(self, spark, corpus, target):
        """raw_sample_fraction < 1 (the 10^12-doc scale path: the ratio
        needs proportions, not counts) still oversamples in-domain."""
        out = dsir.dsir_resample(
            corpus, target, "doc_id", rate=0.5, temperature=0.5,
            raw_sample_fraction=0.6,
        )
        kept = sorted(r["doc_id"] for r in out.collect())
        in_kept = sum(1 for d in kept if d < 12)
        off_kept = sum(1 for d in kept if d >= 12)
        assert in_kept > off_kept

    def test_guards(self, spark, corpus, target):
        with pytest.raises(ValueError, match="rate"):
            dsir.dsir_resample(corpus, target, "doc_id", rate=0.0)
        with pytest.raises(ValueError, match="temperature"):
            dsir.dsir_resample(
                corpus, target, "doc_id", temperature=0.0
            )
        with pytest.raises(ValueError, match="hash_family"):
            dsir.dsir_resample(
                corpus, target, "doc_id", hash_family="sha1"
            ).collect()

    def test_hash_families_agree_on_selection_semantics(
        self, spark, corpus, target
    ):
        """r7: production default is xxhash64 (one JVM hash per gram —
        md5-hex + string-conv measured ~2x the whole stage); the md5
        family remains for the DuckDB score twin.  The families differ
        only in bucket collisions (estimator noise), so BOTH must
        oversample in-domain docs; the md5 path keeps DuckDB score
        parity via test_score_parity_vs_duckdb."""
        for fam in ("xxhash64", "md5_60bit"):
            kept = sorted(
                r["doc_id"]
                for r in dsir.dsir_resample(
                    corpus, target, "doc_id", rate=0.5,
                    temperature=0.5, hash_family=fam,
                ).collect()
            )
            in_kept = sum(1 for d in kept if d < 12)
            off_kept = sum(1 for d in kept if d >= 12)
            assert in_kept > 2 * off_kept, (fam, kept)


class TestCliStage:
    def test_cli_composed(self, spark, tmp_path, monkeypatch):
        from mysql_data_quality_spark import cli

        monkeypatch.chdir(tmp_path)
        rows = [
            (f"https://ex{i}.org/p", t)
            for i, t in enumerate(IN_DOMAIN * 4 + OFF_DOMAIN * 4)
        ]
        pages = (
            spark.createDataFrame(rows, "url: string, text: string")
            .withColumn("lang", F.lit("en"))
            .withColumn("warc_ts", F.current_timestamp())
            .withColumn("html", F.lit(None).cast("binary"))
        )
        tgt = spark.createDataFrame(
            [(t,) for t in IN_DOMAIN], "text: string"
        )
        in_dir, t_dir = str(tmp_path / "in"), str(tmp_path / "tgt")
        pages.write.parquet(in_dir)
        tgt.write.parquet(t_dir)
        out = str(tmp_path / "out")
        rc = cli.main(
            ["filter", "--input", in_dir, "--output", out, "--buckets", "2",
             "--dsir-target", t_dir, "--dsir-rate", "0.5",
             "--dsir-temperature", "0.3"]
        )
        assert rc == 0
        kept = {
            r["url"] for r in spark.read.parquet(f"{out}/data").collect()
        }
        idx = {u: i for i, (u, _) in enumerate(rows)}
        in_kept = sum(1 for u in kept if idx[u] < 12)
        off_kept = sum(1 for u in kept if idx[u] >= 12)
        assert in_kept > off_kept and in_kept >= 8 and off_kept <= 6
