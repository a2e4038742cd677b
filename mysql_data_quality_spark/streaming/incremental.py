"""Structured-Streaming incremental ingestion for the quality filter.

The reference is batch-only (SURVEY.md §2.7); the north rule's pipeline is
resumable checkpointed batch.  This module adds the *optional* streaming
surface: new page files land in a directory → the SAME rule plan
(:func:`quality_filter.annotate`) is applied incrementally → decisions are
appended, exactly-once per micro-batch via ``foreachBatch`` +
Spark streaming checkpoints.

Because ``annotate`` is a pure per-row map, the streaming and batch paths
produce byte-identical decisions for identical input rows — the batch tests
are the semantics oracle; the streaming test checks stream==batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mysql_data_quality_spark.pipeline import quality_filter as QF

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of pages parquet drops (schema pinned — streaming
    sources must not infer)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def start_filter_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """Run the quality filter incrementally; append decisions as parquet.

    ``foreachBatch`` gives the batch writer (and its exactly-once batch-id
    bookkeeping) while keeping the transformation identical to the batch
    path — no separate streaming implementation of the rules to drift.
    """
    stream = stream_pages(spark, input_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        QF.decisions(batch_df).write.mode("append").parquet(output_dir)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
