"""Trained byte-pair-encoding tokenizer — the "real learned weights"
upgrade of the ``BPE_ISH_RE`` token estimate in
``operators/textstats.py``, completing the triple with ``rules/arpa.py``
(real LM for perplexity) and ``rules/langid_trained.py`` (real langid):
token counts for packing / corpus budgeting that come from an actual
learned subword vocabulary instead of a fixed regex.

Algorithm = the public BPE recipe (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units"), with
GPT-2's pre-tokenization *shape* (leading-space word pieces,
contraction suffixes, digit runs, punctuation runs) reduced to plain
``re`` syntax.  Symbols are unicode characters (the Sennrich original),
not GPT-2's byte alphabet — no out-of-alphabet fallback table needed,
and pre-tokens carry their leading space so no end-of-word marker is
required either.

Scale shape:
  * training is BOUNDED: rows are cut by the deterministic hash
    sampler, word frequencies aggregate distributed (explode →
    map-side-combining groupBy), and only the top ``max_words``
    (count desc, word asc — deterministic) reach the driver, where the
    classic merge loop runs over the word-frequency table with an
    incremental pair index.  Training cost never scales with corpus
    size.
  * encoding is an Arrow-batched pandas UDF with a per-distinct-word
    memo — on Zipfian web text the merge loop runs once per DISTINCT
    word per batch, not per occurrence.  Pure map, zero shuffles.

Adjudication: merge selection and encoding are pinned by hand-computed
vectors and a pure-reference re-encode (no SQL twin exists for a
learned vocabulary — same rationale as langid_trained/xxhash64).
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# GPT-2-shaped pre-tokenizer in plain `re` syntax: contraction
# suffixes, space-prefixed letter runs, space-prefixed digit runs,
# space-prefixed punctuation runs, residual whitespace
PRETOK_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-z0-9\s]+"
    r"|\s+"
)
_PRETOK = re.compile(PRETOK_RE)


def pretokenize(text: str | None) -> list:
    """Text -> pre-token strings (lossless: ``''.join`` restores the
    text).  Whitespace runs collapse into the following token's leading
    space where the GPT-2 shape allows; pure-whitespace tokens remain
    for runs with nothing to attach to."""
    if not text:
        return []
    return _PRETOK.findall(text)


# ---------------------------------------------------------------------------
# training (bounded driver-side merge loop over distributed word counts)
# ---------------------------------------------------------------------------
def _pair_stats(vocab: dict) -> tuple[dict, dict]:
    """pair -> total count, pair -> {word: occurrences-in-word}."""
    counts: dict = {}
    index: dict = {}
    for word, freq in vocab.items():
        for a, b in zip(word, word[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
            index.setdefault((a, b), {})
            index[(a, b)][word] = index[(a, b)].get(word, 0) + 1
    return counts, index


def _merge_word(word: tuple, pair: tuple, joined: str) -> tuple:
    out = []
    i = 0
    while i < len(word):
        if (
            i < len(word) - 1
            and word[i] == pair[0]
            and word[i + 1] == pair[1]
        ):
            out.append(joined)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def _bpe_merge_loop(word_freqs: dict, num_merges: int) -> list:
    """Classic BPE over a word-frequency table with incremental pair
    bookkeeping and a lazy-invalidation max-heap (O(log P) selection
    instead of an O(P) scan per merge).  Tie-break: highest count, then
    lexicographically smallest pair — fully deterministic."""
    import heapq

    vocab = {tuple(w): f for w, f in word_freqs.items() if w}
    counts, index = _pair_stats(vocab)
    # heap key (-count, pair): max count first, then smallest pair;
    # entries go stale when counts change — validate on pop
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)

    def bump(pair, delta):
        c = counts.get(pair, 0) + delta
        counts[pair] = c
        if c > 0:
            # push on EVERY change (increments and decrements): pop-time
            # validation discards stale entries, and a decremented pair
            # with no fresh entry would silently vanish from selection
            heapq.heappush(heap, (-c, pair))

    merges: list = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        if counts.get(best, 0) != -negc:
            continue  # stale entry
        if -negc < 2:
            break  # nothing left worth merging
        merges.append(best)
        joined = best[0] + best[1]
        touched = list(index.get(best, {}).keys())
        for word in touched:
            freq = vocab.pop(word, None)
            if freq is None:
                continue
            # retire the old word's pair contributions
            for a, b in zip(word, word[1:]):
                bump((a, b), -freq)
                wd = index.get((a, b))
                if wd and word in wd:
                    del wd[word]
            new_word = _merge_word(word, best, joined)
            prev = vocab.get(new_word)
            vocab[new_word] = (prev or 0) + freq
            if prev is None:
                for a, b in zip(new_word, new_word[1:]):
                    bump((a, b), freq)
                    index.setdefault((a, b), {})
                    index[(a, b)][new_word] = (
                        index[(a, b)].get(new_word, 0) + 1
                    )
            else:
                # word shape already indexed: only counts change
                for a, b in zip(new_word, new_word[1:]):
                    bump((a, b), freq)
        counts[best] = 0
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 4000,
    max_rows: int = 100_000,
    max_words: int = 50_000,
    seed: int = 2024,
) -> dict:
    """Learn a BPE merge list from a corpus -> JSON-ready model dict
    ``{"merges": [[a, b], ...], "pretok": PRETOK_RE}``.

    Word frequencies are computed distributed (Arrow pre-tokenizer →
    explode → one map-side-combining groupBy); only the ``max_words``
    most frequent pre-tokens reach the driver (count desc, word asc —
    a deterministic Zipf head that carries almost all occurrence
    mass), where the merge loop runs."""
    from mysql_data_quality_spark.operators.sampling import hash_sample

    n = df.count()
    if n > max_rows:
        df = hash_sample(df, text_col, max_rows / n, seed=seed)

    @pandas_udf("array<string>")
    def _pretok_udf(texts: pd.Series) -> pd.Series:
        return texts.map(pretokenize)

    freqs = (
        df.select(
            F.explode(_pretok_udf(F.col(text_col))).alias("_bpe_w")
        )
        .groupBy("_bpe_w")
        .agg(F.count(F.lit(1)).alias("_bpe_n"))
        .orderBy(F.col("_bpe_n").desc(), F.col("_bpe_w"))
        .limit(max_words)
        .collect()
    )
    word_freqs = {r["_bpe_w"]: r["_bpe_n"] for r in freqs}
    merges = _bpe_merge_loop(word_freqs, num_merges)
    return {"merges": [list(m) for m in merges], "pretok": PRETOK_RE}


# ---------------------------------------------------------------------------
# encoding (memoized greedy merge application)
# ---------------------------------------------------------------------------
def _ranks(model: dict) -> dict:
    return {tuple(m): i for i, m in enumerate(model["merges"])}


def encode_word(word: str, ranks: dict) -> tuple:
    """Apply merges lowest-rank-first until none apply (the standard
    BPE inference order — replays training's merge sequence)."""
    symbols = tuple(word)
    while len(symbols) > 1:
        best_rank, best_pair = None, None
        for pair in zip(symbols, symbols[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        symbols = _merge_word(
            symbols, best_pair, best_pair[0] + best_pair[1]
        )
    return symbols


def encode_batch(texts, model: dict) -> list:
    """Texts -> token lists, one merge-loop run per DISTINCT word."""
    ranks = _ranks(model)
    memo: dict = {}
    out = []
    for text in texts:
        toks: list = []
        for w in pretokenize(text):
            got = memo.get(w)
            if got is None:
                got = encode_word(w, ranks)
                memo[w] = got
            toks.extend(got)
        out.append(toks)
    return out


def token_count_batch(texts, model: dict) -> list:
    ranks = _ranks(model)
    memo: dict = {}
    out = []
    for text in texts:
        total = 0
        for w in pretokenize(text):
            got = memo.get(w)
            if got is None:
                got = len(encode_word(w, ranks))
                memo[w] = got
            total += got
        out.append(total)
    return out


def token_count_udf(model: dict) -> Column:
    """Arrow-batched pandas UDF: text -> learned-BPE token count (the
    drop-in length column for ``operators/packing`` budgets and corpus
    token accounting)."""
    merges = [list(m) for m in model["merges"]]
    frozen = {"merges": merges}

    @pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        return pd.Series(
            token_count_batch(texts.tolist(), frozen), dtype="int64"
        )

    return _count


def load_model(path: str) -> dict:
    from pathlib import Path

    model = json.loads(Path(path).read_text())
    if "merges" not in model or not isinstance(model["merges"], list):
        raise ValueError(f"not a BPE model file: {path}")
    return model
