"""Custom stateful streaming operator: cross-micro-batch URL dedup via
``applyInPandasWithState`` — the "first crawl of a url wins" semantics a
continuous ingest pipeline needs (re-crawls arrive in later batches and
must not re-emit decisions).

Shape: pages are grouped by a bounded key space (``pmod(xxhash64(url),
n_state_buckets)``) so state partitioning is stable and each state row
holds one bucket's seen-set.  "First" is temporal: each micro-batch is
sorted by (warc_ts, url) before picking firsts, so a re-crawl that happens
to arrive earlier in Arrow batch order never beats an older capture.

State-growth contract (read before running this unbounded):
  * state per bucket is the EXACT md5 set of seen urls, rewritten each
    micro-batch — serialization cost is O(total distinct urls / bucket)
    and grows without bound (NoTimeout, no eviction).  That is the right
    trade for bounded backfills (this sandbox's tests); for an unbounded
    crawl, swap the set for a Bloom filter serialized into the same state
    column (operator shape identical, accepting a false-positive drop
    rate), or add TTL via ``timeoutConf`` if "seen" may expire.
  * ``n_state_buckets`` caps shuffle parallelism for the stateful stage —
    size it to at least the cluster's total cores (the default 16 suits
    local test runs, not a 1000-executor cluster).

Arrow-batched: the user function sees pandas DataFrames.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.StringType()))]
)


def _md5(url: str) -> str:
    return hashlib.md5((url or "").encode("utf-8")).hexdigest()


def _dedup_fn(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    pdfs = list(batches)
    if pdfs:
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        # "first crawl wins" is temporal: order by (warc_ts, url), not by
        # Arrow-batch arrival order (stable sort keeps ties deterministic)
        pdf = pdf.sort_values(
            ["warc_ts", "url"], kind="mergesort", ignore_index=True
        )
        hashes = pdf["url"].map(_md5)
        fresh = ~hashes.isin(seen) & ~hashes.duplicated()
        seen.update(hashes[fresh])
        out = pdf.loc[fresh, ["url", "warc_ts", "text", "lang"]]
        if len(out):
            yield out
    state.update((sorted(seen),))


def first_seen_pages(pages_stream: DataFrame, n_state_buckets: int = 16) -> DataFrame:
    """Streaming DataFrame of first-ever-seen pages (exactly one row per
    url across all micro-batches)."""
    keyed = pages_stream.withColumn(
        "_bucket",
        F.pmod(F.xxhash64(F.col("url")), F.lit(n_state_buckets)).cast("int"),
    )
    return keyed.groupBy("_bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_first_seen_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    n_state_buckets: int = 16,
):
    """File-source stream → stateful first-seen dedup → parquet append."""
    from mysql_data_quality_spark.streaming.incremental import stream_pages

    stream = stream_pages(spark, input_dir)
    deduped = first_seen_pages(stream, n_state_buckets)
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
