"""Benchmark decontamination: flag (and drop) training documents that
contain any n-gram from a held-out evaluation set — the standard
pre-training hygiene stage (GPT-3 appendix C / Llama-style 13-gram
overlap checks).  A training corpus that leaks eval n-grams inflates
benchmark scores; this operator removes the leak at corpus-build time.

Scale shape (the near-dup discipline, applied to eval overlap):

* the EVAL side is tiny by definition (benchmarks are thousands of
  documents, not billions) — its distinct n-gram set builds once and
  rides a BROADCAST to every executor;
* the CORPUS side explodes to (doc_id, gram-hash) rows — ids and 8-byte
  hashes only, document text never leaves its scan — and the overlap
  join is a broadcast semi/inner join, so the corpus is never shuffled;
* `decontaminated_corpus` anti-joins the contaminated ids out — the id
  list is small (contamination is rare), so Spark broadcasts it and the
  corpus stays shuffle-free end to end.

Grams are word-level (the shared whitespace tokenizer, lowercased),
matching the published recipes; ``n`` defaults to 13 (GPT-3's value).
Short documents with fewer than n tokens cannot be flagged (no gram).
The DuckDB twins replay the exact string-gram logic, so both the flag
list and the surviving corpus are hash-comparable at tiny scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_rows(df: DataFrame, id_col: str, text_col: str, n: int):
    """(doc_id, gram) rows — distinct per document, grams HASHED to
    xxhash64 longs at the explode, so the join key, the broadcast, and
    the count-distinct shuffle all carry 8 bytes instead of ~80-byte
    n-gram strings (13-word grams).  A 64-bit collision could flag a
    clean document (false positive — the conservative direction for
    decontamination) with probability ~|eval grams| x |doc grams| / 2^64
    per document: negligible at any real eval-set size.  The DuckDB twin
    joins the strings themselves; results agree barring such collisions
    (exact-parity-tested at gate scale)."""
    from mysql_data_quality_spark.functions.text import tokens_col

    # tokens materialized as their own projection column first: ngrams_col
    # references the token array ~n+2 times (the n-1 shifted zip_with views
    # + size guards), and with the tokenizer expression inlined each
    # reference re-ran the split+filter per row (n≈13 tokenizations/doc).
    # As a multiply-referenced non-cheap alias the column survives
    # CollapseProject, so tokenization runs ONCE per row and the gram
    # builder slices an attribute.
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.lower(F.col(text_col))).alias("_dc_toks"),
    )
    # Gram identity = CHAINED xxhash64 over per-token hashes (hash each
    # token once, then n-1 zip_with levels of xxhash64(acc, next)) —
    # NOT xxhash64 of the materialized n-word gram STRING: building the
    # strings allocates ~n partial-gram strings per final gram through
    # the concat chain and re-hashes ~9n bytes per gram.  Both sides of
    # the overlap join use THIS function, so matching is by construction;
    # the hash family only decides which grams collide (~2^-64/pair
    # either way, the conservative direction).  The trailing j-1 slots of
    # each zip_with level see a null right side (xxhash64 skips nulls →
    # junk values) and are dropped by the final slice, exactly like the
    # null-propagating concat chain in ngrams_col.
    th = F.col("_dc_th")
    nt = F.size(th)
    g = th
    for j in range(2, n + 1):
        shifted = F.slice(th, j, F.greatest(nt - (j - 1), F.lit(0)))
        g = F.zip_with(g, shifted, lambda a, b: F.xxhash64(a, b))
    g = F.slice(g, 1, F.greatest(nt - (n - 1), F.lit(0)))
    grams = F.array_distinct(
        F.when(nt >= n, g).otherwise(F.array().cast("array<bigint>"))
    )
    hashed = base.select(
        "doc_id",
        F.transform(
            F.col("_dc_toks"), lambda t: F.xxhash64(t)
        ).alias("_dc_th"),
    )
    # explode_outer + isNotNull: a plain explode makes Catalyst infer a
    # `size(grams) > 0` filter that re-inlines the token+gram pipeline
    # into a Filter below the Generate (one full extra evaluation per
    # row); outer generates infer nothing, and gram hashes are never
    # null, so filtering the generated attribute is row-identical.
    return hashed.select(
        "doc_id", F.explode_outer(grams).alias("gram")
    ).where(F.col("gram").isNotNull())


def contaminated_docs(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_text: str = "text",
) -> DataFrame:
    """(doc_id, n_eval_grams_hit): corpus documents sharing at least one
    word n-gram with ANY eval document, with the count of distinct eval
    grams they hit.  The eval gram set broadcasts (eval sets are small);
    the corpus side exchanges ids + gram hashes only."""
    eval_grams = (
        _gram_rows(eval_df, eval_text, eval_text, n)
        .select("gram")
        .distinct()
    )
    corpus_grams = _gram_rows(corpus, corpus_id, corpus_text, n)
    # (doc_id, gram) is unique by construction (array_distinct per doc,
    # distinct eval grams), so a plain count equals count_distinct
    # without the distinct-aggregate machinery (map-side combinable)
    return (
        corpus_grams.join(F.broadcast(eval_grams), on="gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_eval_grams_hit"))
    )


def contaminated_docs_sql(
    corpus_rel: str,
    eval_rel: str,
    n: int = 13,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_text: str = "text",
) -> str:
    from mysql_data_quality_spark.functions.text import ngrams_sql, tokens_sql

    def grams_list(text: str) -> str:
        # lower(NULL) is NULL, so tokens_sql's coalesce placement is
        # equivalent — ONE tokenizer + ONE gram builder shared with every
        # other oracle (drift between two gram spellings would silently
        # break the exact-parity gate)
        return f"list_distinct({ngrams_sql(tokens_sql(f'lower({text})'), n)})"

    return f"""
with cg as (
  select {corpus_id} as doc_id, unnest({grams_list(corpus_text)}) as gram
  from {corpus_rel}
), eg as (
  select distinct unnest({grams_list(eval_text)}) as gram from {eval_rel}
)
select cg.doc_id, count(*) as n_eval_grams_hit
from cg join eg on cg.gram = eg.gram
group by cg.doc_id
"""


def decontaminated_corpus(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_text: str = "text",
) -> DataFrame:
    """The corpus minus every contaminated document.  The flagged-id list
    is near-dup-sized (small), so the anti join broadcasts it and the
    corpus never shuffles — same plan shape as deduplicated_corpus."""
    flagged = contaminated_docs(
        corpus, eval_df, n, corpus_id, corpus_text, eval_text
    ).select(F.col("doc_id").alias(corpus_id))
    return corpus.join(F.broadcast(flagged), on=corpus_id, how="left_anti")


def decontaminated_corpus_sql(
    corpus_rel: str,
    eval_rel: str,
    n: int = 13,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_text: str = "text",
) -> str:
    flagged = contaminated_docs_sql(
        corpus_rel, eval_rel, n, corpus_id, corpus_text, eval_text
    )
    # NOT EXISTS, never NOT IN: a NULL id anywhere in the flagged list
    # would make NOT IN evaluate to NULL for EVERY row (empty result),
    # and NULL-id corpus rows must be KEPT like Spark's left-anti join
    # keeps them — same adjudication as domains.py's twin
    return f"""
select * from {corpus_rel} c
where not exists (
  select 1 from ({flagged}) f where f.doc_id = c.{corpus_id}
)
"""


def fuzzy_contaminated_docs(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_text: str = "text",
) -> DataFrame:
    """(doc_id, est_jaccard): corpus documents NEAR-duplicating any eval
    document — the fuzzy complement of :func:`contaminated_docs` for
    paraphrased / lightly-edited eval leakage that exact n-gram overlap
    misses (a single changed word breaks all 13-grams through it, but
    barely moves shingle Jaccard).

    Same scale discipline as the exact path, swapped to the minhash
    machinery (``operators/dedup.py``): the EVAL side's signatures and
    band hashes are tiny and BROADCAST; the corpus side computes
    signatures once (persisted — feeds the band join and the scoring
    join; the CALLER owns the cache lifetime via the
    ``._persisted_sigs`` handle on the returned frame, the
    fingerprint-pairs contract), its band rows
    carry (doc_id, band, bh) only, and candidates from band collisions
    are verified by signature agreement >= ``threshold`` (est_jaccard),
    so a stray band collision cannot flag a clean document.  The corpus
    text never rides a shuffle.  Default geometry is 2 rows/band
    (32/16) — a steep S-curve biased toward RECALL: decontamination
    would rather inspect an extra clean document than ship a leaked
    one; the agreement check supplies the precision the loose banding
    gives up.

    No DuckDB oracle (xxhash64 family — same adjudication as the other
    minhash operators); pytest-pinned semantics instead: paraphrased
    leaks flagged, the exact path's misses demonstrated, clean docs
    untouched."""
    from pyspark import StorageLevel

    from mysql_data_quality_spark.operators.dedup import (
        band_rows,
        minhash_signatures,
    )

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # distinct BEFORE signatures: benchmark dumps repeat texts (same
    # prompt, many targets) — duplicates would multiply the broadcast
    # signature/band rows and fan out the verification join for no
    # behavior change (the id IS the text hash, so distinct collapses
    # exactly the duplicates)
    ev = eval_df.select(
        F.xxhash64(F.coalesce(F.col(eval_text), F.lit(""))).alias("_ev_id"),
        F.col(eval_text).alias("_ev_text"),
    ).distinct()
    ev_sigs = minhash_signatures(ev, "_ev_id", "_ev_text", k, num_hashes)
    ev_bands = band_rows(ev_sigs, num_hashes, bands).withColumnRenamed(
        "doc_id", "_ev_id"
    )
    c_sigs = minhash_signatures(
        corpus, corpus_id, corpus_text, k, num_hashes
    ).persist(StorageLevel.MEMORY_AND_DISK)
    c_bands = band_rows(c_sigs, num_hashes, bands)
    cand = (
        c_bands.join(F.broadcast(ev_bands), on=["band", "bh"])
        .select("doc_id", "_ev_id")
        .distinct()
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig", "_ev_sig", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    # the candidate list is contamination-sized (small); broadcasting it
    # keeps the corpus-wide signature frame OUT of any shuffle — the
    # verification join is a broadcast probe over c_sigs' map output
    out = (
        c_sigs.join(F.broadcast(cand), on="doc_id")
        .join(
            F.broadcast(
                ev_sigs.select(
                    F.col("doc_id").alias("_ev_id"),
                    F.col("sig").alias("_ev_sig"),
                )
            ),
            on="_ev_id",
        )
        .withColumn(
            "est_jaccard", agree.cast("double") / F.lit(float(num_hashes))
        )
        .where(F.col("est_jaccard") >= threshold)
        .groupBy("doc_id")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )
    # caller owns the cache lifetime (same contract as
    # textstats.fingerprint_duplicate_pairs): unpersist after the result
    # is materialized via `result._persisted_sigs.unpersist()`
    out._persisted_sigs = c_sigs
    return out


def fuzzy_decontaminated_corpus(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_text: str = "text",
) -> DataFrame:
    """The corpus minus fuzzy-contaminated documents — flagged ids are
    few, broadcast anti join, corpus never shuffles (the
    deduplicated_corpus plan shape).  The signature cache handle rides
    through as ``._persisted_sigs`` (unpersist once materialized)."""
    scored = fuzzy_contaminated_docs(
        corpus, eval_df, threshold, k, num_hashes, bands,
        corpus_id, corpus_text, eval_text,
    )
    flagged = scored.select(F.col("doc_id").alias(corpus_id))
    out = corpus.join(F.broadcast(flagged), on=corpus_id, how="left_anti")
    out._persisted_sigs = scored._persisted_sigs
    return out
