"""Similarity search over embedding columns (array<float>).

  * :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
    query set against the corpus, dot/norms as JVM ``zip_with`` +
    ``aggregate`` column math (no Python), per-query top-k via window
    ``row_number`` (TakeOrdered per partition then merge).
  * :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH.
    Sign-bit signatures from deterministic pseudo-random hyperplanes
    (seeded from xxhash64, no RNG state), candidates restricted to
    same-bucket vectors (Hamming-0 on the signature prefix), then exact
    cosine re-rank within buckets.  At 10^12 rows the bucket join replaces
    the full cross product; recall is tuned by bands/bits.

Both keep the whole hot path in Catalyst; Python appears nowhere per-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-order dot product in double (parity with the SQL oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB fragment with the same operation order as :func:`cosine_col`."""
    def dot(x: str, y: str) -> str:
        return (
            f"list_sum(list_transform(list_zip({x}, {y}), "
            "p -> p[1]::double * p[2]::double))"
        )

    def norm(x: str) -> str:
        return f"sqrt(list_sum(list_transform({x}, v -> v::double * v::double)))"

    return f"({dot(a, b)}) / (({norm(a)}) * ({norm(b)}))"


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (query_id, embedding) — small; broadcast so the corpus scan is
    shuffle-free and the only exchange is the final per-query top-k merge.
    Deterministic tie-break on (similarity desc, vec_id asc).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.crossJoin(q).withColumn(
        "cosine", cosine_col(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------
def _hyperplane(dim: int, bit: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random hyperplane: component h[d] derived from a
    splitmix-style integer mix of (seed, bit, d) — reproducible across runs
    and cluster sizes, no RNG object."""
    out = []
    for d in range(dim):
        x = (seed * 0x9E3779B97F4A7C15 + bit * 0xBF58476D1CE4E5B9 + d + 1) & (
            2**64 - 1
        )
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & (2**64 - 1)
        x ^= x >> 31
        # map to [-1, 1)
        out.append((x / 2**63) - 1.0)
    return out


def signature_col(vec: Column, dim: int, bits: int = 16, seed: int = 42) -> Column:
    """Integer LSH signature: bit b = 1 iff dot(vec, hyperplane_b) >= 0."""
    sig = F.lit(0).cast("long")
    for b in range(bits):
        h = F.lit(_hyperplane(dim, b, seed))
        pos = dot_col(vec, h) >= 0
        sig = sig + F.when(
            pos, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return sig


def _bucket_array(vec: Column, dim: int, bits: int, tables: int) -> Column:
    """array<struct<tbl,bkt>> — one hyperplane-LSH bucket per table, with
    per-table independent hyperplane seeds."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                signature_col(vec, dim, bits, seed=42 + 1000 * t).alias("bkt"),
            )
            for t in range(tables)
        ]
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: standard multi-table hyperplane LSH.

    ``tables`` independent signatures (different hyperplane seeds); a
    corpus vector is a candidate if it shares ANY table's bucket with the
    query; candidates get an exact cosine re-rank.  Expected candidate set
    ~ tables * corpus / 2^bits — `bits` trades cost, `tables` buys recall.
    The bucket join shuffles only (table_id, bucket, id) — tiny keys."""

    def buckets(vec: Column) -> Column:
        return _bucket_array(vec, dim, bits, tables)

    c = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("c_vec"),
            F.explode(buckets(F.col(vec_col))).alias("b"),
        )
        .select("vec_id", "c_vec", "b.tbl", "b.bkt")
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(buckets(F.col(vec_col))).alias("b"),
        ).select("query_id", "q_vec", "b.tbl", "b.bkt")
    )
    cand = (
        c.join(q, on=["tbl", "bkt"])
        .select("query_id", "q_vec", "vec_id", "c_vec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn(
        "cosine", cosine_col(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    )


def lsh_near_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.6,
    bits: int = 4,
    tables: int = 24,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs embedding near-dup: (ia, ib, cosine) for pairs
    with cosine >= threshold — the scale path that replaces the O(n²)
    crossJoin (kept as `embedding_near_pairs`, this operator's tiny-scale
    oracle).

    Plan: explode each vector into ``tables`` hyperplane buckets carrying
    ONLY (tbl, bkt, id) — the wide embedding never rides the candidate
    join; a self-join on (tbl, bkt) yields candidates, which are joined
    back to the vectors by id for an exact cosine re-rank.  Shuffle volume
    is O(n·tables·(id+bucket)) + O(candidates·id), sub-quadratic as long
    as buckets stay selective.

    Recall for a pair at cosine c: 1 - (1 - p^bits)^tables with
    p = 1 - arccos(c)/π; the defaults (4 bits × 24 tables) give ≥0.98 for
    c ≥ 0.4.  Raise ``bits`` (selectivity) and ``tables`` (recall) together
    at larger corpus sizes."""
    ids = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    banded = ids.select(
        "vec_id", F.explode(_bucket_array(F.col("vec"), dim, bits, tables)).alias("b")
    ).select("vec_id", "b.tbl", "b.bkt")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on=["tbl", "bkt"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib")
        )
        .dropDuplicates(["ia", "ib"])
    )
    va = ids.select(F.col("vec_id").alias("ia"), F.col("vec").alias("ea"))
    vb = ids.select(F.col("vec_id").alias("ib"), F.col("vec").alias("eb"))
    return (
        cand.join(va, on="ia")
        .join(vb, on="ib")
        .withColumn("cosine", cosine_col(F.col("ea"), F.col("eb")))
        .where(F.col("cosine") >= threshold)
        .select("ia", "ib", "cosine")
    )
