"""Pure-pandas parity checks of the batch scorers vs the declared
semantics, plus real multi-language langid vectors (no Spark needed)."""

from __future__ import annotations

import math

import pandas as pd

from mysql_data_quality_spark.functions import checkdigits
from mysql_data_quality_spark.rules import langid, perplexity


class TestLangidBatch:
    def test_real_language_sentences(self):
        texts = pd.Series(
            [
                "the cat is on the mat and it is happy with this",
                "der hund ist nicht zu hause und die katze auch nicht",
                "le chat est dans la maison et il est pour vous",
                "el perro es una mascota para los humanos como su amigo",
                "il gatto non è il cane che sono per la casa",  # it markers
                "um gato não é um cão mais como os outros",
                "xyzzy plugh qwertz",
                "",
            ]
        )
        out = langid._detect_batch(texts).tolist()
        assert out == ["en", "de", "fr", "es", "it", "pt", "und", "und"]

    def test_tiebreak_is_declaration_order(self):
        # one en marker + one de marker -> tie -> 'en' (first declared)
        out = langid._detect_batch(pd.Series(["the und"])).tolist()
        assert out == ["en"]

    def test_markers_collision_free(self):
        seen = {}
        for lang, markers in langid.LANG_MARKERS.items():
            for m in markers:
                assert m not in seen, f"{m} in both {seen.get(m)} and {lang}"
                seen[m] = lang


class TestPerplexityBatch:
    def test_closed_form_matches_sequential(self):
        texts = pd.Series(
            ["the data table", "xyzzy the", "", "the " * 1000 + "qqq"]
        )
        got = perplexity._avg_logprob_batch(texts).tolist()
        for text, g in zip(texts, got):
            toks = text.split()
            if not toks:
                assert g == perplexity.EMPTY_DOC_LOGP
                continue
            seq = 0.0
            for t in toks:
                seq += perplexity.LOGP.get(t.lower(), perplexity.OOV_LOGP)
            assert g == seq / len(toks)  # exact: dyadic-rational sums

    def test_logps_are_dyadic(self):
        # the exactness guarantee rests on this
        assert perplexity._IN_VOCAB_LOGP * 32 == int(
            perplexity._IN_VOCAB_LOGP * 32
        )
        assert perplexity.OOV_LOGP * 32 == int(perplexity.OOV_LOGP * 32)

    def test_perplexity_of_pure_vocab(self):
        ppl = math.exp(-perplexity._IN_VOCAB_LOGP)
        assert 60 < ppl < 70  # ~ e^4.15625


class TestCheckdigitsBatch:
    def test_known_vectors(self):
        cpfs = pd.Series(
            ["123.456.789-09", "12345678909", "987.654.321-00",
             "111.111.111-11", "123.456.789-10", None, "", "12345"]
        )
        assert checkdigits.cpf_valid_batch(cpfs).tolist() == [
            True, True, True, False, False, False, False, False]
        cnpjs = pd.Series(
            ["11.444.777/0001-61", "11444777000161", "11.222.333/0001-81",
             "00.000.000/0000-00", "123456789012345", "11.444.777/0001-62"]
        )
        assert checkdigits.cnpj_valid_batch(cnpjs).tolist() == [
            True, True, True, False, False, False]


class TestLuhnAndCardScrub:
    # reference vectors: well-known test PANs (Luhn-valid by
    # construction) and their single-digit corruptions
    VALID = ["4111111111111111", "5500 0000 0000 0004", "3400-0000-0000-009",
             "6011000000000004"]
    INVALID = ["4111111111111112", "1234567812345678", "0000000000000000",
               "411111111111", None, "", "not digits at all"]

    def test_luhn_column_validator(self, spark):
        from pyspark.sql import functions as F

        from mysql_data_quality_spark.functions.checkdigits import (
            luhn_valid_batch,
            luhn_valid_udf,
        )

        import pandas as pd

        vals = self.VALID + self.INVALID
        got = luhn_valid_batch(pd.Series(vals)).tolist()
        assert got == [True] * len(self.VALID) + [False] * len(self.INVALID)
        df = spark.createDataFrame([(v,) for v in vals], "card: string")
        rows = df.select(
            luhn_valid_udf()(F.col("card")).alias("ok")
        ).collect()
        assert [r["ok"] for r in rows] == got

    def test_batch_scalar_parity(self):
        """r5 review: the numpy batch validator and the canonical scalar
        rule (which the card scrubber calls per match) must agree on a
        digit-string sweep — one Luhn definition, two execution shapes."""
        import random

        import pandas as pd

        from mysql_data_quality_spark.functions.checkdigits import (
            luhn_ok,
            luhn_valid_batch,
        )

        rng = random.Random(7)
        sweep = [
            "".join(rng.choice("0123456789") for _ in range(n))
            for n in list(range(11, 22)) * 40
        ] + ["4111111111111111", "0" * 16, "5500000000000004"]
        got = luhn_valid_batch(pd.Series(sweep)).tolist()
        assert got == [luhn_ok(s) for s in sweep]
        assert any(got), "sweep should contain at least one valid PAN"

    def test_card_scrub_semantics(self, spark):
        from pyspark.sql import functions as F

        from mysql_data_quality_spark.rules.pii import (
            scrub_credit_cards_udf,
        )

        rows = [
            (1, "pay 4111111111111111 now"),            # valid -> scrubbed
            (2, "pay 4111 1111 1111 1111 now"),         # separators too
            (3, "ref 1234567812345678 invoice"),        # luhn-fail -> kept
            (4, "phone 1234-5678 is short"),            # too short -> kept
            (5, None),
            (6, "two cards 4111111111111111 and 5500 0000 0000 0004."),
        ]
        df = spark.createDataFrame(rows, "id: bigint, text: string")
        got = {
            r["id"]: r["t"]
            for r in df.select(
                "id", scrub_credit_cards_udf()(F.col("text")).alias("t")
            ).collect()
        }
        assert got[1] == "pay <CARD> now"
        assert got[2] == "pay <CARD> now"
        assert got[3] == "ref 1234567812345678 invoice"
        assert got[4] == "phone 1234-5678 is short"
        # null-preserving, like the regexp_replace scrub chain (r5 ADVICE)
        assert got[5] is None
        assert got[6] == "two cards <CARD> and <CARD>."

    def test_default_scrub_chain_untouched(self, spark):
        """Cards are OPT-IN: the golden-pinned default chain must not
        redact them (byte-identity contract)."""
        from pyspark.sql import functions as F

        from mysql_data_quality_spark.rules import pii

        df = spark.createDataFrame(
            [("pay 4111111111111111 now",)], "text: string"
        )
        out = df.select(pii.scrub_col(F.col("text")).alias("t")).collect()
        assert out[0]["t"] == "pay 4111111111111111 now"
