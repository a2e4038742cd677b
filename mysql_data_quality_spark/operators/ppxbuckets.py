"""CCNet-style perplexity bucketing (Wenzek et al. 2020): split each
language's documents into head / middle / tail thirds by LM perplexity,
so a training mix can oversample the head (low-perplexity ≈ clean prose)
and drop or downweight the tail.  The bucket label — not a hard drop —
is the product: CCNet ships all three and lets the consumer choose.

Two paths, one contract:

* :func:`perplexity_tertiles` — EXACT rank semantics: ``ntile(3)`` over
  (score, id) per language.  Rank-based, so the cross-engine compare
  involves only integer bucket numbers computed from bit-identical
  doubles — no interpolated float thresholds to drift by an ulp (the
  quantile-interpolation trap in the oracle-parity rules).  The window
  partitions by LANGUAGE: correct and fast while each language's slice
  fits a sort (CCNet itself buckets per language on bounded samples);
  on a corpus where one language is ~everything, use the approx path.
* :func:`perplexity_buckets_approx` — the 100 TB path: per-language
  1/3 and 2/3 thresholds from ``percentile_approx`` (a map-side-
  combining sketch agg — no global sort, no window funnel), broadcast
  back, then a pure-map bucket assignment.  Bucket fractions are
  approximate (sketch accuracy 1/acc); boundaries can move a hair under
  repartitioning (sketch merge order), so this path is pytest-pinned on
  fractions + threshold-monotonicity, not hash-compared (same
  adjudication as HLL/sampling).

Scores default to the engine's deterministic unigram ``avg_logprob``
(lower is better ⇒ bucketing DESCENDS by avg_logprob to make bucket 1
the head, matching perplexity ASC); any score column works — e.g. the
ARPA model's output via ``annotate(lm=...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKET_NAMES = {1: "head", 2: "middle", 3: "tail"}


def _bucket_name(tile: Column) -> Column:
    return (
        F.when(tile == 1, F.lit("head"))
        .when(tile == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )


def _default_score(df: DataFrame, text_col: str) -> DataFrame:
    from mysql_data_quality_spark.functions.text import tokens_col
    from mysql_data_quality_spark.rules.perplexity import avg_logprob_col

    # same feature definition as the flagship rule plan
    # (rules/heuristics.py: avg_logprob_col over the shared tokenizer)
    return df.withColumn(
        "avg_logp", avg_logprob_col(tokens_col(F.col(text_col)))
    )


def perplexity_tertiles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str | None = None,
    lang_col: str = "lang",
) -> DataFrame:
    """Adds ``ppx_bucket`` (head/middle/tail) by exact per-language rank:
    ntile(3) over (score DESC, id) — head = highest avg log-prob =
    lowest perplexity.  Deterministic and cross-engine hash-comparable
    (integer ranks over a total order, no float thresholds)."""
    if score_col is None:
        df = _default_score(df, text_col)
        score_col = "avg_logp"
    w = Window.partitionBy(lang_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return df.withColumn("ppx_bucket", _bucket_name(F.ntile(3).over(w)))


def perplexity_tertiles_sql(
    rel: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str | None = None,
    lang_col: str = "lang",
) -> str:
    """DuckDB twin of :func:`perplexity_tertiles` (identical standard
    ntile semantics: first n%3 groups take the extra row)."""
    if score_col is None:
        from mysql_data_quality_spark.functions.text import tokens_sql
        from mysql_data_quality_spark.rules.perplexity import (
            avg_logprob_sql,
        )

        score = avg_logprob_sql(tokens_sql(text_col))
        base = f"select *, {score} as avg_logp from {rel}"
        score_col = "avg_logp"
    else:
        base = f"select * from {rel}"
    return f"""
select *, case ntile(3) over (
    partition by {lang_col} order by {score_col} desc, {id_col})
  when 1 then 'head' when 2 then 'middle' else 'tail' end as ppx_bucket
from ({base})
"""


def perplexity_buckets_approx(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str | None = None,
    lang_col: str = "lang",
    accuracy: int = 10_000,
    threshold_fraction: float = 1.0,
) -> DataFrame:
    """The scale path: per-language [1/3, 2/3] score thresholds from one
    ``percentile_approx`` sketch agg (map-side combining — no sort, no
    window), broadcast back, bucket as a pure map.  Adds ``ppx_bucket``;
    ties at a threshold fall toward the better bucket.

    The operator makes two passes over the corpus (thresholds, then the
    bucket map); ``threshold_fraction < 1`` computes the thresholds on a
    deterministic hash sample of that fraction (what CCNet itself does),
    cutting the first pass's scan and score cost proportionally — at
    10^12 docs even 1% is a 10^10-doc quantile estimate.

    NULL-language documents bucket against their own group's cuts (null-
    safe join), matching the exact path; a language entirely absent from
    the threshold sample falls back to corpus-wide cuts rather than
    collapsing to 'tail'."""
    if score_col is None:
        df = _default_score(df, text_col)
        score_col = "avg_logp"
    cut_src = df
    if not 0.0 < threshold_fraction <= 1.0:
        raise ValueError(
            f"threshold_fraction must be in (0, 1]: {threshold_fraction}"
        )
    if threshold_fraction < 1.0:
        from mysql_data_quality_spark.operators.sampling import hash_sample

        cut_src = hash_sample(df, id_col, threshold_fraction)
    # ONE rollup pass yields the per-language cut rows AND a grand-total
    # (corpus-wide) row, distinguished by grouping(): still map-side
    # combinable, no extra scan.  The global row backstops languages the
    # hash sample missed entirely (threshold_fraction < 1) — without it
    # their docs would all fall to 'tail' regardless of score.
    #
    # The cuts are COLLECTED to the driver (bounded: #languages + 1 rows
    # — the same bounded-aggregate-collect class as the IVF train sample)
    # and re-enter the plan as a literal frame + literal array: one scan,
    # no checkpoint blocks lingering in executor storage, and the
    # bucketing plan has NO lineage back to the threshold pass.  The
    # threshold job therefore runs when THIS function is called (the
    # thresholds ARE a stats pass), not at first downstream action.
    rows = cut_src.rollup(lang_col).agg(
        F.percentile_approx(
            score_col, [1.0 / 3.0, 2.0 / 3.0], accuracy
        ).alias("_ppx_cuts"),
        F.grouping(lang_col).alias("_ppx_g"),
    ).collect()
    spark = df.sparkSession
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    lang_type = df.schema[lang_col].dataType

    def _dbl(cuts):
        # percentile_approx over an integer score column yields ints
        return None if cuts is None else [float(x) for x in cuts]

    per_lang = spark.createDataFrame(
        [
            (r[lang_col], _dbl(r["_ppx_cuts"]))
            for r in rows
            if r["_ppx_g"] == 0
        ],
        StructType([
            StructField("_ppx_lang", lang_type),
            StructField("_ppx_cuts", ArrayType(DoubleType())),
        ]),
    )
    glob = _dbl(
        next((r["_ppx_cuts"] for r in rows if r["_ppx_g"] == 1), None)
    )
    glob_lit = (
        F.lit(glob)
        if glob is not None
        else F.lit(None).cast("array<double>")
    )
    # eqNullSafe, not an equi-join: a NULL language is a real group (the
    # langid-failed slice) with its own cut row — a plain `on=lang_col`
    # would strand every NULL-lang doc on NULL cuts (⇒ 'tail'), diverging
    # from the exact path, which ntiles the NULL partition like any other
    joined = df.join(
        F.broadcast(per_lang),
        F.col(lang_col).eqNullSafe(F.col("_ppx_lang")),
        "left",
    ).drop("_ppx_lang")
    cuts = F.coalesce(F.col("_ppx_cuts"), glob_lit)
    head_cut = F.element_at(cuts, 2)  # the top third starts here
    mid_cut = F.element_at(cuts, 1)
    bucket = (
        F.when(F.col(score_col) >= head_cut, F.lit("head"))
        .when(F.col(score_col) >= mid_cut, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.withColumn("ppx_bucket", bucket).drop("_ppx_cuts")
