"""Mojibake repair (the ftfy-style utf-8-read-as-cp1252 fix): canonical
examples, nested double-encoding, the perfect-inverse safety property
(clean text — including legitimate 'Ã' usage and emoji — is NEVER
altered), a generated round-trip fuzz over random unicode, and the
Spark column + CLI stage."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mysql_data_quality_spark.functions.normalize import (
    fix_mojibake_col,
    fix_mojibake_text,
)

CANONICAL = [
    ("Ã©", "é"),
    ("â€™", "’"),
    ("Ã¼ber naÃ¯ve rÃ©sumÃ©", "über naïve résumé"),
    ("â€œquotedâ€\x9d", "“quoted”"),
]


class TestPure:
    @pytest.mark.parametrize("raw,want", CANONICAL)
    def test_canonical_cases(self, raw, want):
        assert fix_mojibake_text(raw) == want

    def test_double_layer(self):
        double = (
            "déjà vu".encode("utf-8").decode("cp1252")
            .encode("utf-8").decode("cp1252")
        )
        assert fix_mojibake_text(double) == "déjà vu"

    def test_clean_text_untouched(self):
        for t in (
            "plain ascii",
            "Ã is a letter in Portuguese alphabets",
            "emoji 🎉 and accents é stay",
            "",
            None,
        ):
            assert fix_mojibake_text(t) == t

    def test_roundtrip_fuzz(self):
        """For ANY text whose mojibake form cp1252-round-trips, repair
        is an exact inverse; and repair(clean) == clean for texts with
        no mojibake signature."""
        rng = random.Random(42)
        alphabet = (
            "abcdefghij ÀÉÎÕüßçñé’“€…äöå"
        )
        for _ in range(300):
            clean = "".join(
                rng.choice(alphabet) for _ in range(rng.randrange(1, 40))
            )
            try:
                moji = clean.encode("utf-8").decode("cp1252")
            except UnicodeDecodeError:
                continue  # some byte patterns aren't cp1252-decodable
            assert fix_mojibake_text(moji) == clean, repr(moji)

    def test_ambiguous_input_prefers_no_change_over_corruption(self):
        """A string that ENCODES to invalid utf-8 must come back
        unchanged — the repair never applies a lossy transform."""
        t = "Ã " + "☃"  # snowman is not cp1252-encodable
        assert fix_mojibake_text(t) == t


class TestSparkAndCli:
    def test_column(self, spark):
        df = spark.createDataFrame(
            [(1, "Ã©tÃ©"), (2, "clean"), (3, None)], "id: long, t: string"
        )
        got = {
            r["id"]: r["f"]
            for r in df.select(
                "id", fix_mojibake_col(F.col("t")).alias("f")
            ).collect()
        }
        assert got == {1: "été", 2: "clean", 3: None}

    def test_cli_stage(self, spark, tmp_path, monkeypatch):
        from mysql_data_quality_spark import cli
        from tests.test_domains import GOOD

        monkeypatch.chdir(tmp_path)
        moji = GOOD.replace("order.", "ordÃ©r.")  # é mojibake'd
        pages = (
            spark.createDataFrame(
                [("https://m.example/p", moji),
                 ("https://c.example/p", GOOD + " two")],
                "url: string, text: string",
            )
            .withColumn("lang", F.lit("en"))
            .withColumn("warc_ts", F.current_timestamp())
            .withColumn("html", F.lit(None).cast("binary"))
        )
        in_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
        pages.write.parquet(in_dir)
        rc = cli.main(
            ["filter", "--input", in_dir, "--output", out,
             "--buckets", "2", "--fix-mojibake"]
        )
        assert rc == 0
        got = {
            r["url"]: r["scrubbed_text"]
            for r in spark.read.parquet(f"{out}/data").collect()
        }
        assert "ordér." in got["https://m.example/p"]
        assert "Ã" not in got["https://m.example/p"]
