"""Trained BPE tokenizer (functions/bpe.py): merge-loop equivalence
with a brute-force reference (the adjudication for a learned vocabulary
with no SQL twin), the Sennrich textbook example, lossless
pre-tokenization, encode/count consistency + memoization, training
determinism + boundedness, UDF/driver parity + partition invariance,
packing composition, and the train-bpe CLI."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from mysql_data_quality_spark.functions import bpe


def _brute_merges(word_freqs: dict, num_merges: int) -> list:
    """O(V) recount per merge — the obviously-correct reference."""
    vocab = {tuple(w): f for w, f in word_freqs.items() if w}
    merges = []
    for _ in range(num_merges):
        counts: dict = {}
        for word, freq in vocab.items():
            for p in zip(word, word[1:]):
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break
        merges.append(best)
        j = best[0] + best[1]
        nv: dict = {}
        for word, freq in vocab.items():
            nw = bpe._merge_word(word, best, j)
            nv[nw] = nv.get(nw, 0) + freq
        vocab = nv
    return merges


class TestMergeLoop:
    def test_matches_brute_force_on_random_vocabs(self):
        rng = random.Random(42)
        for trial in range(40):
            words: dict = {}
            for _ in range(rng.randint(3, 25)):
                w = "".join(
                    rng.choice("abcde ") for _ in range(rng.randint(1, 8))
                )
                words[w] = words.get(w, 0) + rng.randint(1, 20)
            nm = rng.randint(1, 30)
            assert bpe._bpe_merge_loop(words, nm) == _brute_merges(
                words, nm
            ), trial

    def test_sennrich_textbook_example(self):
        wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        m = bpe._bpe_merge_loop(wf, 4)
        # ('e','s') appears 9x (newest+widest) — the clear first merge
        assert m[0] == ("e", "s")
        assert m[1] == ("es", "t")  # 'est' appears 9x

    def test_stops_below_count_two(self):
        assert bpe._bpe_merge_loop({"ab": 1, "cd": 1}, 10) == []

    def test_deterministic_tie_break(self):
        # 'ab' and 'cd' both occur twice: lexicographically smaller wins
        m = bpe._bpe_merge_loop({"ab": 2, "cd": 2}, 1)
        assert m == [("a", "b")]


class TestPretokenizer:
    CASES = [
        "Hello world, it's 2024!",
        "  leading spaces",
        "tabs\tand\nnewlines",
        "digits123mixed",
        "",
        "émoji ☕ café",
    ]

    def test_lossless(self):
        for t in self.CASES:
            assert "".join(bpe.pretokenize(t)) == t, repr(t)

    def test_contraction_split(self):
        toks = bpe.pretokenize("it's")
        assert toks == ["it", "'s"]

    def test_leading_space_attaches(self):
        assert bpe.pretokenize("a bc") == ["a", " bc"]


class TestEncoding:
    @pytest.fixture(scope="class")
    def model(self):
        wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, " the": 9}
        return {
            "merges": [
                list(m) for m in bpe._bpe_merge_loop(wf, 20)
            ],
            "pretok": bpe.PRETOK_RE,
        }

    def test_trained_words_compress(self, model):
        ranks = bpe._ranks(model)
        # fully-merged training words collapse to few symbols
        assert len(bpe.encode_word("newest", ranks)) <= 2
        assert len(bpe.encode_word("low", ranks)) <= 2

    def test_unseen_word_falls_back_to_chars(self, model):
        ranks = bpe._ranks(model)
        assert bpe.encode_word("zqx", ranks) == ("z", "q", "x")

    def test_counts_equal_encode_lengths(self, model):
        texts = ["newest lower zqx", "", None, "low low low"]
        counts = bpe.token_count_batch(texts, model)
        encs = bpe.encode_batch(texts, model)
        assert counts == [len(e) for e in encs]
        assert counts[1] == 0 and counts[2] == 0

    def test_encode_merge_order_is_rank_order(self, model):
        """Inference replays training's merge sequence: applying
        merges lowest-rank-first must reproduce the training-time
        segmentation of a training word."""
        ranks = bpe._ranks(model)
        assert "".join(bpe.encode_word("widest", ranks)) == "widest"


class TestTrainingOnSpark:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (f"u{i}", "the lowest rate the newest data the widest web")
            for i in range(50)
        ] + [(f"v{i}", "unique filler line number %d" % i) for i in range(10)]
        return spark.createDataFrame(rows, "url string, text string")

    def test_train_is_deterministic(self, corpus):
        m1 = bpe.train_bpe(corpus, num_merges=50)
        m2 = bpe.train_bpe(corpus, num_merges=50)
        assert m1 == m2

    def test_frequent_words_become_single_tokens(self, corpus):
        model = bpe.train_bpe(corpus, num_merges=200)
        ranks = bpe._ranks(model)
        # ' the' dominates the corpus: must merge to one symbol
        assert len(bpe.encode_word(" the", ranks)) == 1

    def test_max_words_bounds_driver_state(self, corpus):
        model = bpe.train_bpe(corpus, num_merges=50, max_words=5)
        assert len(model["merges"]) <= 50  # trains, just on the head

    def test_udf_matches_driver(self, spark, corpus):
        model = bpe.train_bpe(corpus, num_merges=100)
        got = (
            corpus.repartition(7)
            .withColumn("n", bpe.token_count_udf(model)("text"))
            .select("url", "n")
            .toPandas()
            .sort_values("url")
        )
        texts = (
            corpus.select("url", "text").toPandas().sort_values("url")
        )
        want = bpe.token_count_batch(texts["text"].tolist(), model)
        assert got["n"].tolist() == want

    def test_packing_composes_with_bpe_lengths(self, spark, corpus):
        """The learned counter drops into pack_assignments as the
        length column — the budget invariant holds on real counts."""
        from mysql_data_quality_spark.operators.packing import (
            pack_assignments,
        )

        model = bpe.train_bpe(corpus, num_merges=100)
        with_len = corpus.withColumn(
            "n_tok", bpe.token_count_udf(model)("text")
        )
        packed = pack_assignments(
            with_len, "url", "n_tok", target_tokens=32, n_buckets=4
        )
        pdf = packed.toPandas()
        assert set(pdf["url"]) == set(
            r["url"] for r in corpus.select("url").collect()
        )
        sizes = pdf.groupby(["pack_bucket", "pack_id"])["n_tok"].sum()
        # cumsum packing: a pack may overflow by at most one doc
        max_doc = pdf["n_tok"].max()
        assert (sizes <= 32 + max_doc).all()

    def test_model_json_round_trip(self, corpus, tmp_path):
        model = bpe.train_bpe(corpus, num_merges=50)
        p = tmp_path / "bpe.json"
        p.write_text(json.dumps(model))
        loaded = bpe.load_model(str(p))
        t = ["the newest data"]
        assert bpe.token_count_batch(t, loaded) == bpe.token_count_batch(
            t, model
        )
        with pytest.raises(ValueError, match="not a BPE model"):
            (tmp_path / "bad.json").write_text("{}")
            bpe.load_model(str(tmp_path / "bad.json"))


class TestCli:
    def test_train_bpe_e2e(self, spark, tmp_path, capsys, monkeypatch):
        from mysql_data_quality_spark import cli

        monkeypatch.chdir(tmp_path)
        rc = cli.main(
            ["train-bpe", "--documents", "/root/testdata/sf0.001",
             "--output", str(tmp_path / "bpe.json"), "--merges", "300"]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["n_merges"] > 50
        model = bpe.load_model(str(tmp_path / "bpe.json"))
        # learned counts beat character count and land near word scale
        text = "the data pipeline filters the web corpus"
        n = bpe.token_count_batch([text], model)[0]
        assert 0 < n < len(text)

    def test_corpus_stats_bpe_accounting(
        self, spark, tmp_path, capsys, monkeypatch
    ):
        from mysql_data_quality_spark import cli
        from mysql_data_quality_spark.pipeline import pages as P

        monkeypatch.chdir(tmp_path)
        wfile = str(tmp_path / "bpe.json")
        rc = cli.main(
            ["train-bpe", "--documents", "/root/testdata/sf0.001",
             "--output", wfile, "--merges", "200"]
        )
        assert rc == 0
        capsys.readouterr()
        rc = cli.main(
            ["corpus-stats", "--documents", "/root/testdata/sf0.001",
             "--bpe-model", wfile]
        )
        assert rc == 0
        report = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        model = bpe.load_model(wfile)
        texts = [
            r["text"]
            for r in P.read_pages(spark, "/root/testdata/sf0.001")
            .select("text")
            .collect()
        ]
        want = sum(bpe.token_count_batch(texts, model))
        assert report["bpe_total_tokens"] == want
        assert report["bpe_tokens_per_doc"] == round(
            want / report["n_docs"], 2
        )
