"""DSIR-style data selection: importance resampling toward a target
domain (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — public method description; implementation is
original Spark).

No reference counterpart (the reference validates tables; this is the
training-data selection stage a web-scale pipeline runs between
dedup and packing): estimate two bag-of-hashed-ngram distributions —
the raw corpus and a small in-domain TARGET sample — and keep each raw
document with probability proportional to the importance weight
``exp(sum over its ngrams of log p_target(bucket) - log p_raw(bucket))``.

Spark shape (everything bounded or broadcastable by construction):

  1. ``hashed_ngram_buckets``: unigram+bigram tokens hashed into
     ``n_buckets`` (cross-engine md5 family, so DuckDB replays the
     features exactly);
  2. bucket histograms via explode → groupBy(bucket) — map-side
     combinable, at most ``n_buckets`` rows survive per side;
  3. ``dsir_log_ratios``: outer-join the two ≤n_buckets-row histograms,
     add-α smoothing, one log-ratio row per bucket — a ≤n_buckets-row
     frame that BROADCASTS;
  4. ``dsir_scores``: explode corpus ngrams → broadcast-join the ratio
     table → groupBy(doc) sum.  Ngram rows shuffle as (bucket:long,
     id) pairs only; text never moves;
  5. ``dsir_resample``: deterministic Bernoulli — keep iff
     ``unit_hash(id) < rate · w / E[w]`` with ``E[w]`` one bounded
     aggregate; replays/resumes stable, no ``rand()``.

At 10^12 docs the only driver-side values are 2 scalar totals and
``E[w]``; the ratio table is ≤n_buckets rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql_data_quality_spark.functions.text import tokens_col, tokens_sql
from mysql_data_quality_spark.operators.dedup import (
    md5_int60_col,
    md5_int60_sql,
)

DEFAULT_BUCKETS = 10_000


def _bucket_hash(key: Column, n_buckets: int, hash_family: str) -> Column:
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(key), F.lit(n_buckets))
    if hash_family == "md5_60bit":
        return F.pmod(md5_int60_col(key), F.lit(n_buckets))
    raise ValueError(
        f"hash_family must be xxhash64|md5_60bit: {hash_family!r}"
    )


def _buckets_from_toks(
    toks: Column, n_buckets: int, hash_family: str
) -> Column:
    """Bucket array from an already-materialized token-array column.
    ``toks`` should be an attribute reference at DataFrame scale (it is
    referenced 4x below; an inlined tokenizer expression would re-split
    the text once per reference)."""
    uni = F.transform(
        toks,
        lambda t: _bucket_hash(
            F.concat(F.lit("u:"), t), n_buckets, hash_family
        ),
    )
    # bigrams via zip_with over two pre-sliced arrays: the HOF's array
    # ARGUMENTS evaluate once per row and the lambda touches only its
    # own variables — never element_at(toks, i) inside the body, which
    # would re-evaluate the whole token pipeline per element (the
    # O(n²) winnowing trap; see memory/spark-graft-perf-gotchas)
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: _bucket_hash(
                F.concat(F.lit("b:"), a, F.lit(" "), b),
                n_buckets,
                hash_family,
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.concat(uni, bi)


def hashed_ngram_buckets(
    text: Column,
    n_buckets: int = DEFAULT_BUCKETS,
    hash_family: str = "md5_60bit",
) -> Column:
    """array<long> of hashed feature buckets: one per unigram
    (``u:tok``) and one per bigram (``b:tok1 tok2``) of the
    lowercased whitespace tokens.

    ``hash_family``: ``"md5_60bit"`` (default here — the cross-engine
    family :func:`hashed_ngram_buckets_sql` replays exactly; the parity
    tests use this Column builder directly) or ``"xxhash64"`` (one JVM
    hash per gram instead of md5-hex + string-conv — the production
    family the shipped :func:`dsir_resample` stage uses; same repo
    convention as minhash/winnowing: algorithms gate-checked on the md5
    family, production runs xxhash64)."""
    return _buckets_from_toks(
        tokens_col(F.lower(text)), n_buckets, hash_family
    )


def hashed_ngram_buckets_sql(
    text: str, n_buckets: int = DEFAULT_BUCKETS
) -> str:
    """DuckDB twin of :func:`hashed_ngram_buckets`."""
    toks = tokens_sql(f"lower({text})")
    uni_key = "'u:' || t"
    bi_key = f"'b:' || ({toks})[i] || ' ' || ({toks})[i+1]"
    uni = (
        f"list_transform({toks}, t -> "
        + md5_int60_sql(uni_key)
        + f" % {n_buckets})"
    )
    bi = (
        f"case when len({toks}) >= 2 then ["
        + md5_int60_sql(bi_key)
        + f" % {n_buckets} for i in range(1, len({toks}))] "
        "else [] end"
    )
    return f"list_concat({uni}, {bi})"


def _gram_buckets(
    df: DataFrame, text_col: str, n_buckets: int, hash_family: str,
    keep_cols: tuple = (),
) -> DataFrame:
    """(…keep_cols, bucket) exploded gram-bucket rows; the token array is
    materialized as its own projection column first so the tokenizer runs
    once per row (it is referenced 4x by the bucket builder)."""
    base = df.select(
        *keep_cols,
        tokens_col(F.lower(F.col(text_col))).alias("_ds_toks"),
    )
    # explode_outer + isNotNull: a plain explode would make Catalyst
    # infer a size()>0 filter that re-inlines the whole bucket pipeline
    # below the Generate (decontaminate.py has the same note); bucket
    # values are never null, so the row sets are identical.
    return base.select(
        *keep_cols,
        F.explode_outer(
            _buckets_from_toks(F.col("_ds_toks"), n_buckets, hash_family)
        ).alias("bucket"),
    ).where(F.col("bucket").isNotNull())


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int,
    hash_family: str = "md5_60bit",
) -> DataFrame:
    """(bucket, n): histogram of hashed ngram buckets over a corpus."""
    return (
        _gram_buckets(df, text_col, n_buckets, hash_family)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    hash_family: str = "md5_60bit",
) -> DataFrame:
    """(bucket, log_ratio): add-α-smoothed
    ``log p_target(bucket) − log p_raw(bucket)`` per feature bucket —
    the ≤``n_buckets``-row importance model.  ``target`` is the small
    in-domain sample (what you want more of); ``raw`` is the corpus
    being selected from (or an unbiased hash-sample of it —
    distributions only need proportions)."""
    t = _bucket_counts(
        target, text_col, n_buckets, hash_family
    ).withColumnRenamed("n", "t_n")
    r = _bucket_counts(
        raw, text_col, n_buckets, hash_family
    ).withColumnRenamed("n", "r_n")
    # two bounded scalar totals; the histograms themselves stay frames
    t_total = t.agg(F.coalesce(F.sum("t_n"), F.lit(0))).collect()[0][0]
    r_total = r.agg(F.coalesce(F.sum("r_n"), F.lit(0))).collect()[0][0]
    joined = t.join(r, on="bucket", how="full_outer").select(
        "bucket",
        F.coalesce(F.col("t_n"), F.lit(0)).alias("t_n"),
        F.coalesce(F.col("r_n"), F.lit(0)).alias("r_n"),
    )
    t_denom = float(t_total + alpha * n_buckets)
    r_denom = float(r_total + alpha * n_buckets)
    return joined.select(
        "bucket",
        (
            F.log((F.col("t_n") + F.lit(float(alpha))) / F.lit(t_denom))
            - F.log((F.col("r_n") + F.lit(float(alpha))) / F.lit(r_denom))
        ).alias("log_ratio"),
    )


def dsir_scores(
    corpus: DataFrame,
    ratios: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    length_normalize: bool = True,
    hash_family: str = "md5_60bit",
) -> DataFrame:
    """(id, dsir_score): per-document importance log-weight = sum of
    its ngrams' log ratios, divided by the ngram count when
    ``length_normalize`` (recommended: otherwise long documents get
    extreme weights purely from length).  Docs with no ngrams score 0.
    The ratio table broadcasts (≤n_buckets rows); ngram rows shuffle as
    (bucket, id) longs only.  ``hash_family`` must match the one the
    ``ratios`` frame was built with."""
    grams = _gram_buckets(
        corpus, text_col, n_buckets, hash_family, keep_cols=(F.col(id_col),)
    )
    summed = (
        grams.join(F.broadcast(ratios), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("log_ratio"), F.lit(0.0))).alias("_s"),
            F.count(F.lit(1)).alias("_k"),
        )
    )
    score = (
        F.col("_s") / F.col("_k") if length_normalize else F.col("_s")
    )
    return (
        corpus.select(id_col)
        .join(summed, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(score, F.lit(0.0)).alias("dsir_score"),
        )
    )


def dsir_resample(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    rate: float = 0.5,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    temperature: float = 1.0,
    seed: int = 0,
    raw_sample_fraction: float = 1.0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The shipped stage: keep each corpus row with probability
    ``min(1, rate · w / E[w])`` where ``w = exp(dsir_score /
    temperature)`` — expected keep fraction ≈ ``rate`` with
    target-like documents oversampled.  Deterministic (membership is a
    pure function of the id), so replays and resumes keep the same
    rows.  ``temperature`` flattens (>1) or sharpens (<1) the
    preference; E[w] is one bounded aggregate.

    ``raw_sample_fraction < 1`` estimates the RAW-side histogram on a
    deterministic hash-sample of the corpus (what DSIR itself does —
    the ratio needs proportions, not counts), cutting the first gram
    pass proportionally: at 10^12 docs even 1% is a 10^10-doc
    histogram.  The scoring pass always covers the full corpus.

    ``hash_family`` defaults to ``"xxhash64"`` — ONE JVM hash per gram.
    The md5 family (``"md5_60bit"``) exists for the DuckDB score twin
    (md5-hex + string-conv per gram measured ~2x the whole stage); the
    two families differ only in which grams collide into a shared
    bucket (~n_grams/n_buckets either way), i.e. sampling noise of the
    same estimator, not a semantic knob — the same xxhash64-production/
    md5-oracle split as minhash and winnowing."""
    from mysql_data_quality_spark.operators.sampling import (
        hash_sample,
        unit_hash_col,
    )

    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1]: {rate}")
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0: {temperature}")
    if not 0.0 < raw_sample_fraction <= 1.0:
        raise ValueError(
            f"raw_sample_fraction must be in (0, 1]: {raw_sample_fraction}"
        )
    raw_side = (
        hash_sample(corpus, id_col, raw_sample_fraction, seed=seed + 1)
        if raw_sample_fraction < 1.0
        else corpus
    )
    ratios = dsir_log_ratios(
        raw_side, target, text_col, n_buckets, alpha, hash_family
    )
    scores = dsir_scores(
        corpus, ratios, id_col, text_col, n_buckets,
        hash_family=hash_family,
    )
    w = F.exp(F.col("dsir_score") / F.lit(float(temperature)))
    weighted = scores.select(F.col(id_col), w.alias("_w"))
    from pyspark import StorageLevel

    weighted = weighted.persist(StorageLevel.MEMORY_AND_DISK)
    mean_w = weighted.agg(F.avg("_w")).collect()[0][0] or 1.0
    p_keep = F.least(
        F.lit(1.0), F.lit(float(rate)) * F.col("_w") / F.lit(float(mean_w))
    )
    kept_ids = weighted.where(
        unit_hash_col(F.col(id_col), seed) < p_keep
    ).select(id_col)
    out = corpus.join(kept_ids, on=id_col, how="left_semi")
    out._persisted_weights = weighted  # caller-owned cache handle
    return out


def dsir_scores_sql(
    corpus_rel: str,
    target_rel: str,
    id_col: str,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    length_normalize: bool = True,
) -> str:
    """DuckDB twin of ratios+scores (floats: compare with tolerance —
    ln() is libm-dependent across engines, unlike +,*,/)."""
    grams = hashed_ngram_buckets_sql(text_col, n_buckets)
    norm = "/ cast(k.k as double)" if length_normalize else ""
    return f"""
with t_g as (
  select unnest({grams}) as bucket from {target_rel}
), r_g as (
  select unnest({grams}) as bucket from {corpus_rel}
), t_c as (
  select bucket, count(*) as t_n from t_g group by 1
), r_c as (
  select bucket, count(*) as r_n from r_g group by 1
), tot as (
  select (select count(*) from t_g) as t_total,
         (select count(*) from r_g) as r_total
), ratios as (
  select coalesce(t_c.bucket, r_c.bucket) as bucket,
         ln((coalesce(t_n, 0) + {alpha!r})
            / (tot.t_total + {alpha!r} * {n_buckets}))
       - ln((coalesce(r_n, 0) + {alpha!r})
            / (tot.r_total + {alpha!r} * {n_buckets})) as log_ratio
  from t_c full outer join r_c on t_c.bucket = r_c.bucket, tot
), doc_g as (
  select {id_col}, unnest({grams}) as bucket from {corpus_rel}
), sums as (
  select {id_col}, sum(coalesce(log_ratio, 0.0)) as s, count(*) as k
  from doc_g left join ratios using (bucket)
  group by 1
)
select c.{id_col},
       coalesce(k.s {norm}, 0.0) as dsir_score
from {corpus_rel} c left join sums k on c.{id_col} = k.{id_col}
"""
