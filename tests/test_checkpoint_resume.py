"""F6 scale/ops fixtures: crash-mid-run resume, idempotent re-run, and
lineage bookkeeping (north rule: identical final table after kill+resume)."""

from __future__ import annotations

import pytest

from mysql_data_quality_spark.pipeline import pages as P
from mysql_data_quality_spark.pipeline import quality_filter as QF
from mysql_data_quality_spark.pipeline.checkpoint import (
    CheckpointedWriter,
    with_bucket,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def decisions(spark):
    return QF.decisions(P.read_pages(spark, SF_SMOKE))


def _table(spark, writer):
    return (
        writer.read(spark)
        .select("url", "keep", "drop_reason", "scrubbed_text")
        .orderBy("url")
        .toPandas()
    )


class TestCheckpointResume:
    def test_bucket_is_deterministic(self, spark, decisions):
        a = with_bucket(decisions).select("url", "bucket").orderBy("url").toPandas()
        b = (
            with_bucket(decisions.repartition(7))
            .select("url", "bucket")
            .orderBy("url")
            .toPandas()
        )
        assert (a["bucket"].values == b["bucket"].values).all()

    def test_crash_then_resume_identical(self, spark, decisions, tmp_path):
        # uninterrupted reference run
        ref = CheckpointedWriter(str(tmp_path / "ref"), n_buckets=8)
        stats = ref.run(decisions, group_size=2)
        assert stats["written"] == 8 and stats["skipped"] == 0
        expected = _table(spark, ref)

        # crash after 2 of 4 groups, then resume
        w = CheckpointedWriter(str(tmp_path / "crash"), n_buckets=8)
        with pytest.raises(RuntimeError, match="injected crash"):
            w.run(decisions, group_size=2, fail_after_groups=2)
        assert 0 < len(w.completed_buckets()) < 8
        done_before_resume = len(w.completed_buckets())
        stats2 = w.run(decisions, group_size=2)  # resume
        assert stats2["skipped"] == done_before_resume
        assert stats2["written"] == 8 - done_before_resume
        assert w.completed_buckets() == set(range(8))
        actual = _table(spark, w)
        assert expected.equals(actual)

    def test_rerun_is_idempotent(self, spark, decisions, tmp_path):
        w = CheckpointedWriter(str(tmp_path / "idem"), n_buckets=4)
        w.run(decisions, group_size=4)
        first = _table(spark, w)
        stats = w.run(decisions, group_size=4)  # everything already done
        assert stats["written"] == 0 and stats["skipped"] == 4
        assert _table(spark, w).equals(first)

    def test_lineage_counts(self, spark, decisions, tmp_path):
        w = CheckpointedWriter(str(tmp_path / "lin"), n_buckets=4)
        w.run(decisions, group_size=2)
        lin = w.lineage(spark).toPandas()
        assert len(lin) == 4
        assert lin["rows"].sum() == decisions.count()
        kept = decisions.where("keep").count()
        assert lin["kept"].sum() == kept
