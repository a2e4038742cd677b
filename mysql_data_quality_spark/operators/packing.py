"""Sequence packing — assign documents to fixed-token-budget PACKS, the
preprocessing step between a cleaned corpus and an LLM training run
(every trainer concatenates documents into target-length sequences;
deciding WHICH documents share a sequence is this operator).

Exact bin packing is NP-hard and the classic greedy is inherently
sequential, so the distributed shape is bucket-then-pack: documents
hash-partition into ``n_buckets`` independent streams (deterministic —
``pmod(xxhash64(id), n)``, so reruns and engines agree), and packing
runs per bucket.  At 10^12 documents with 2^20 buckets each bucket
holds ~10^6 docs — comfortably one task.  Two packing disciplines:

  * :func:`pack_assignments` — **contiguous cumsum packing** (pure
    Column): within a bucket, order by id, running token sum, ``pack =
    floor((cumsum - tokens) / target)``.  A document straddling a
    boundary joins the pack it STARTED in, so packs can overflow by at
    most one document (trainers that chunk long documents anyway — the
    GPT-2/3 recipe — absorb this).  One shuffle (the bucket window),
    whole-stage codegen, and an exact DuckDB twin
    (:func:`pack_assignments_sql` — integer window math, hash-exact).
  * :func:`pack_assignments_greedy` — **first-fit-in-order greedy**
    (Arrow ``applyInPandas`` per bucket): a pack closes when the next
    document would exceed the budget, so no pack overflows (documents
    longer than the budget get a singleton pack).  The per-bucket
    Python loop is O(bucket size); pinned against a pure-Python
    reference rather than SQL (the loop carries state no window
    expression reproduces).

Output contract (both): the input columns plus ``pack_bucket``,
``pack_id`` (globally unique: ``bucket * 2^40 + index-within-bucket``)
and ``pack_tokens`` is NOT included — downstream groupBy(pack_id) gets
it in one map-side-combining agg when needed.

Reference analogue: none (the reference is a per-table validator); this
belongs to the training-data operator family the north rule adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: pack ids are bucket * 2^40 + within-bucket index — 2^40 packs per
#: bucket is unreachable (a bucket would need ~10^12 docs), and the
#: product stays far inside int64 for any realistic bucket count.
_PACK_STRIDE = 1 << 40


def _bucket_col(id_col: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(id_col), F.lit(int(n_buckets))).cast("int")


def _check(target_tokens: int, n_buckets: int) -> None:
    if target_tokens < 1:
        raise ValueError(f"target_tokens must be >= 1: {target_tokens}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")


def pack_assignments(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    target_tokens: int,
    n_buckets: int = 64,
    bucket_col: str | None = None,
) -> DataFrame:
    """Contiguous cumsum packing (see module docstring).  Documents with
    NULL or non-positive token counts count as 1 token (they still need
    a slot).  ``bucket_col`` names a precomputed bucket column to use
    instead of the xxhash64 default — the cross-engine parity tests pass
    the same md5-derived bucket through both engines this way."""
    _check(target_tokens, n_buckets)
    toks = F.greatest(
        F.coalesce(F.col(tokens_col).cast("bigint"), F.lit(1)), F.lit(1)
    )
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bucket = (
        F.col(bucket_col).cast("int")
        if bucket_col
        else _bucket_col(F.col(id_col), n_buckets)
    )
    out = (
        df.withColumn("pack_bucket", bucket)
        .withColumn("_t", toks)
        .withColumn("_cum", F.sum("_t").over(w))
        .withColumn(
            "pack_id",
            F.col("pack_bucket").cast("bigint") * F.lit(_PACK_STRIDE)
            + F.floor(
                (F.col("_cum") - F.col("_t"))
                / F.lit(int(target_tokens))
            ),
        )
        .drop("_t", "_cum")
    )
    return out


def pack_assignments_sql(
    rel: str,
    id_col: str,
    tokens_col: str,
    target_tokens: int,
    n_buckets: int = 64,
) -> str:
    """DuckDB twin of :func:`pack_assignments`.  The bucket hash uses
    the cross-engine md5-derived unit in 0..n-1 — Spark's xxhash64 has
    no DuckDB twin, so the ORACLE variant of the operator passes a
    pre-computed ``pack_bucket`` column through both engines instead;
    this SQL assumes the relation already carries ``pack_bucket`` (the
    parity tests build it with the shared md5 hash)."""
    _check(target_tokens, n_buckets)
    t = (
        f"greatest(coalesce(cast({tokens_col} as bigint), 1), 1)"
    )
    return f"""
select * exclude (_t, _cum),
       cast(pack_bucket as bigint) * {_PACK_STRIDE}
         + cast(floor((_cum - _t) / {int(target_tokens)}) as bigint)
         as pack_id
from (
  select *, {t} as _t,
         sum({t}) over (partition by pack_bucket order by {id_col}
                        rows unbounded preceding) as _cum
  from {rel}
)
"""


def pack_assignments_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    target_tokens: int,
    n_buckets: int = 64,
) -> DataFrame:
    """First-fit-in-order greedy packing per bucket (no pack exceeds the
    budget; over-budget documents get singleton packs).  Arrow
    ``applyInPandas`` with an O(bucket) loop; same output contract as
    :func:`pack_assignments`."""
    import pandas as pd

    _check(target_tokens, n_buckets)
    with_bucket = df.withColumn(
        "pack_bucket", _bucket_col(F.col(id_col), n_buckets)
    )
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in with_bucket.schema.fields
    )
    schema = f"{fields}, pack_id bigint"
    tgt = int(target_tokens)

    # no type hints: quoted hints make applyInPandas warn it can't infer
    # the eval type (it falls back correctly, but loudly)
    def pack_one(key, pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(
            drop=True
        )
        toks = (
            pdf[tokens_col].fillna(1).astype("int64").clip(lower=1)
        )
        base = int(key[0]) * _PACK_STRIDE
        ids, cur, used = [], 0, 0
        for t in toks:
            t = int(t)
            if used > 0 and used + t > tgt:
                cur += 1
                used = 0
            ids.append(base + cur)
            used += t
        pdf["pack_id"] = pd.Series(ids, dtype="int64")
        return pdf

    return with_bucket.groupBy("pack_bucket").applyInPandas(
        pack_one, schema=schema
    )


def pack_stats(packed: DataFrame, tokens_col: str) -> DataFrame:
    """(pack_id, n_docs, pack_tokens) — one map-side-combining agg; the
    fill-rate report a curator reads to pick target/bucket settings."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(
                F.coalesce(F.col(tokens_col).cast("bigint"), F.lit(1)),
                F.lit(1),
            )
        ).alias("pack_tokens"),
    )
