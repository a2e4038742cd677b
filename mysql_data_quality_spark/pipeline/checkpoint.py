"""Per-partition checkpointed, resumable writes with lineage.

North-rule requirement (BASELINE.json): "resumable from per-partition
checkpoints with lineage and rule-hit metrics tables".  No reference
counterpart (the reference is single-process, SURVEY.md §2.7) — this is the
scale mechanism that makes a 10^12-row run restartable.

Design (idempotent-partition-overwrite + bookkeeping, SURVEY.md §4.2):
  * the corpus is bucketed by ``pmod(xxhash64(url), n_buckets)`` — a pure
    function of the row, so bucket membership is identical across runs,
    partitionings, and cluster sizes;
  * output is written bucket-partitioned (``partitionBy("bucket")``) with
    dynamic partition overwrite, so re-writing a bucket is idempotent;
  * a lineage table (one row per completed bucket: rows, kept, written_at)
    is committed AFTER each bucket group's data lands — crash between data
    and lineage just re-does that group;
  * resume = read lineage, process only missing buckets.

At 100 TB you'd set n_buckets in the thousands and process groups of
buckets per job; bucket grouping bounds both task count and re-do cost.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_bucket(df: DataFrame, key: str = "url", n_buckets: int = 16) -> DataFrame:
    """Deterministic bucket id — pure function of the key."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


class CheckpointedWriter:
    """Resumable bucket-partitioned parquet writer with lineage."""

    def __init__(self, out_dir: str, n_buckets: int = 16, key: str = "url"):
        self.out_dir = Path(out_dir)
        self.data_dir = self.out_dir / "data"
        self.lineage_dir = self.out_dir / "lineage"
        self.n_buckets = n_buckets
        self.key = key

    # -- lineage bookkeeping (tiny JSON files: atomic-rename commit) -------
    def completed_buckets(self) -> set[int]:
        if not self.lineage_dir.exists():
            return set()
        done = set()
        for p in self.lineage_dir.glob("bucket_*.json"):
            rec = json.loads(p.read_text())
            done.add(int(rec["bucket"]))
        return done

    def _commit_lineage(self, records: list[dict]) -> None:
        self.lineage_dir.mkdir(parents=True, exist_ok=True)
        for rec in records:
            tmp = self.lineage_dir / f".bucket_{rec['bucket']}.json.tmp"
            final = self.lineage_dir / f"bucket_{rec['bucket']}.json"
            tmp.write_text(json.dumps(rec))
            tmp.rename(final)  # atomic commit

    # -- write --------------------------------------------------------------
    def run(
        self,
        df: DataFrame,
        group_size: int = 4,
        fail_after_groups: int | None = None,
    ) -> dict:
        """Write ``df`` (must contain `keep`) bucket by bucket group.

        ``fail_after_groups`` injects a crash for the resume test.
        Returns run stats.  Already-completed buckets are skipped, so
        re-running after a crash converges to the identical final table.
        """
        spark = df.sparkSession
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        bdf = with_bucket(df, self.key, self.n_buckets)
        done = self.completed_buckets()
        todo = [b for b in range(self.n_buckets) if b not in done]
        groups = [
            todo[i : i + group_size] for i in range(0, len(todo), group_size)
        ]
        written = 0
        for gi, group in enumerate(groups):
            if fail_after_groups is not None and gi >= fail_after_groups:
                raise RuntimeError(
                    f"injected crash after {gi} groups (resume test)"
                )
            part = bdf.where(F.col("bucket").isin(group))
            part.write.mode("overwrite").partitionBy("bucket").parquet(
                str(self.data_dir)
            )
            stats = (
                part.groupBy("bucket")
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum(F.col("keep").cast("long")).alias("kept"),
                )
                .collect()
            )
            self._commit_lineage(
                [
                    {
                        "bucket": int(r["bucket"]),
                        "rows": int(r["rows"]),
                        "kept": int(r["kept"]),
                        "written_at": time.time(),
                    }
                    for r in stats
                ]
            )
            written += len(group)
        return {
            "n_buckets": self.n_buckets,
            "skipped": len(done),
            "written": written,
        }

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(str(self.data_dir))

    def lineage(self, spark: SparkSession) -> DataFrame:
        recs = [
            json.loads(p.read_text())
            for p in sorted(self.lineage_dir.glob("bucket_*.json"))
        ]
        return spark.createDataFrame(
            recs, "bucket: int, rows: long, kept: long, written_at: double"
        )
