"""CCNet perplexity head/middle/tail bucketing: exact-tertile DuckDB
parity (rank-based — no float-threshold drift), bucket ordering
semantics, the approx (sketch-threshold) scale path, and the degenerate
all-ties corpus."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mysql_data_quality_spark.operators import ppxbuckets as PB
from tests.conftest import SF_CORRECT


class TestPerplexityTertiles:
    def test_default_score_duckdb_parity(self, spark, duck):
        """Default unigram avg_logprob score at sf0.001 — degenerate
        (every doc fully in-vocab → identical score), which makes this a
        pure tie-break determinism check: both engines must resolve the
        total order (score desc, doc_id) identically."""
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        pdf = PB.perplexity_tertiles(docs).orderBy("doc_id").toPandas()
        con = duckdb.connect()
        con.sql(
            "create view documents as select * from "
            f"'{SF_CORRECT}/documents.parquet'"
        )
        want = con.sql(
            PB.perplexity_tertiles_sql("documents") + " order by doc_id"
        ).df()
        assert list(pdf.columns) == list(want.columns)
        assert (pdf["ppx_bucket"].values == want["ppx_bucket"].values).all()

    def test_spread_score_duckdb_parity_and_ordering(self, spark):
        """n_chars as the score (real spread): exact parity, and within
        each language every head score >= every middle score >= every
        tail score."""
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        out = PB.perplexity_tertiles(docs, score_col="n_chars")
        pdf = out.orderBy("doc_id").toPandas()
        con = duckdb.connect()
        con.sql(
            "create view documents as select * from "
            f"'{SF_CORRECT}/documents.parquet'"
        )
        want = con.sql(
            PB.perplexity_tertiles_sql("documents", score_col="n_chars")
            + " order by doc_id"
        ).df()
        assert (pdf["ppx_bucket"].values == want["ppx_bucket"].values).all()
        for lang, grp in pdf.groupby("lang"):
            by = {
                b: g["n_chars"] for b, g in grp.groupby("ppx_bucket")
            }
            assert by["head"].min() >= by["middle"].max() - 0  # desc rank
            assert by["middle"].min() >= by["tail"].max() - 0
            # tertile sizes differ by at most one
            sizes = sorted(len(v) for v in by.values())
            assert sizes[-1] - sizes[0] <= 1

    def test_approx_matches_exact_on_spread_scores(self, spark):
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        ap = PB.perplexity_buckets_approx(
            docs, score_col="n_chars"
        ).toPandas()
        ex = PB.perplexity_tertiles(docs, score_col="n_chars").toPandas()
        m = ap.merge(
            ex[["doc_id", "ppx_bucket"]], on="doc_id",
            suffixes=("_a", "_e"),
        )
        # sketch thresholds at accuracy=10k on 500 docs are near-exact;
        # only boundary ties may differ
        assert (m.ppx_bucket_a == m.ppx_bucket_e).mean() >= 0.95
        fr = ap.groupby("ppx_bucket").size() / len(ap)
        for b in ("head", "middle", "tail"):
            assert abs(fr[b] - 1 / 3) < 0.05, dict(fr)
        # threshold bucketing is monotone by construction
        for lang, grp in ap.groupby("lang"):
            by = {b: g["n_chars"] for b, g in grp.groupby("ppx_bucket")}
            assert by["head"].min() >= by["middle"].max() - 0
            assert by["middle"].min() >= by["tail"].max() - 0

    def test_threshold_sample_fraction(self, spark):
        """Thresholds from a 40% deterministic hash sample still bucket
        the full corpus (every row labeled), fractions stay near thirds,
        and an out-of-range fraction raises."""
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        ap = PB.perplexity_buckets_approx(
            docs, score_col="n_chars", threshold_fraction=0.4
        ).toPandas()
        assert len(ap) == 500 and ap["ppx_bucket"].notna().all()
        fr = ap.groupby("ppx_bucket").size() / len(ap)
        for b in ("head", "middle", "tail"):
            assert abs(fr[b] - 1 / 3) < 0.15, dict(fr)
        with pytest.raises(ValueError):
            PB.perplexity_buckets_approx(
                docs, score_col="n_chars", threshold_fraction=0.0
            )

    def test_approx_all_ties_fall_to_head(self, spark):
        """Constant score (the sf corpus's real unigram avg_logp):
        thresholds equal the score, so every doc lands in head — the
        documented tie direction (toward the better bucket)."""
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        ap = PB.perplexity_buckets_approx(docs)
        assert (
            ap.select("ppx_bucket").distinct().collect()[0][0] == "head"
        )

    def test_approx_plan_has_no_sort_or_window(self, spark):
        """The scale path must stay a sketch agg + broadcast join + map:
        no Window, no global Sort of the corpus."""
        from mysql_data_quality_spark.plans.compiler import formatted_plan

        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        plan = formatted_plan(
            PB.perplexity_buckets_approx(docs, score_col="n_chars")
        )
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan

    def test_approx_null_lang_buckets_by_its_own_cuts(self, spark):
        """r5 review: NULL language is a real group (the langid-failed
        slice) — its docs must bucket against their OWN cuts like the
        exact path ntiles them, not collapse to 'tail' via an unmatched
        equi-join."""
        rows = [(i, None, float(i)) for i in range(1, 10)] + [
            (i, "en", float(i - 10)) for i in range(11, 20)
        ]
        df = spark.createDataFrame(
            rows, "doc_id: bigint, lang: string, s: double"
        )
        ap = PB.perplexity_buckets_approx(df, score_col="s").toPandas()
        nul = ap[ap["lang"].isna()].set_index("doc_id")["ppx_bucket"]
        assert set(nul.unique()) == {"head", "middle", "tail"}
        assert nul[9] == "head" and nul[1] == "tail"
        # and the exact path agrees on the extremes
        ex = PB.perplexity_tertiles(df, score_col="s").toPandas()
        exn = ex[ex["lang"].isna()].set_index("doc_id")["ppx_bucket"]
        assert exn[9] == "head" and exn[1] == "tail"

    def test_approx_sampled_out_lang_falls_back_to_global_cuts(self, spark):
        """r5 review: a language entirely missing from the threshold
        sample must bucket against corpus-wide cuts, not land in 'tail'
        regardless of score."""
        from mysql_data_quality_spark.operators.sampling import hash_sample

        base = spark.createDataFrame(
            [(i, "en", float(i)) for i in range(1, 61)],
            "doc_id: bigint, lang: string, s: double",
        )
        sampled = {
            r["doc_id"]
            for r in hash_sample(base, "doc_id", 0.5).collect()
        }
        excluded = sorted(set(range(1, 61)) - sampled)
        assert excluded, "need at least one hash-excluded id"
        # the rare language exists ONLY on ids the sample excludes; its
        # one doc carries the corpus-max score -> global cuts say 'head'
        rare_id = excluded[0]
        rows = [
            (i, ("zz" if i == rare_id else "en"),
             (1000.0 if i == rare_id else float(i)))
            for i in range(1, 61)
        ]
        df = spark.createDataFrame(
            rows, "doc_id: bigint, lang: string, s: double"
        )
        ap = PB.perplexity_buckets_approx(
            df, score_col="s", threshold_fraction=0.5
        ).toPandas()
        assert (
            ap.loc[ap["lang"] == "zz", "ppx_bucket"].iloc[0] == "head"
        )

    def test_named_buckets_complete(self, spark):
        assert set(PB.BUCKET_NAMES.values()) == {"head", "middle", "tail"}
