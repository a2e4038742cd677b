"""End-to-end analysis orchestrator — the Spark re-expression of the
reference's ``DataQualityOrchestrator``
(``/root/reference/src/data_quality/core/orchestrator.py:142-324``):
load (with count-gated sampling) -> metadata/volumetry -> validation ->
summary -> reports under a shared basename.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from mysql_data_quality_spark.core.engine import ValidationEngine
from mysql_data_quality_spark.core.types import RuleResult
from mysql_data_quality_spark.plans.compiler import plan_scan, volumetry
from mysql_data_quality_spark.reports.summary import (
    analyze_results,
    quality_score_band,
    write_json_report,
    write_text_report,
)
from mysql_data_quality_spark.validators import (
    CompletenessValidator,
    DuplicatesValidator,
    IntegrityValidator,
    PatternsValidator,
)


def default_engine(
    reference_frames: Optional[dict[str, DataFrame]] = None,
    config=None,
) -> ValidationEngine:
    """Engine with the four standard families registered (reference
    orchestrator.py:60-85 registers the same set; integrity post-connect).

    ``config``: a ``core.config.Config`` (or None to read the environment)
    — its duplicates skip/force lists drive the DuplicatesValidator, the
    reference's env-driven column binding (config.py + .env.example)."""
    from mysql_data_quality_spark.core.config import DuplicatesConfig

    dup_cfg = (
        config.duplicates if config is not None else DuplicatesConfig.from_env()
    )
    eng = ValidationEngine()
    eng.register_validator(CompletenessValidator())
    eng.register_validator(dup_cfg.make_validator())
    eng.register_validator(PatternsValidator())
    eng.register_validator(IntegrityValidator(reference_frames or {}))
    return eng


class Orchestrator:
    def __init__(
        self,
        spark: SparkSession,
        engine: Optional[ValidationEngine] = None,
        sample_size: Optional[int] = None,
        output_dir: str | Path = "reports",
    ) -> None:
        self.spark = spark
        self.engine = engine or default_engine()
        self.sample_size = sample_size
        self.output_dir = Path(output_dir)

    def analyze_table(
        self,
        df: DataFrame,
        table_name: str,
        validator_names: Optional[list[str]] = None,
    ) -> dict:
        """analyze_table analogue (orchestrator.py:142-224): returns
        results + metadata + summary."""
        t0 = time.perf_counter()
        sampled = plan_scan(df, self.sample_size)
        metadata = volumetry(df, sampled if self.sample_size else None)
        results: list[RuleResult] = self.engine.validate_data(
            sampled, table_name, validator_names
        )
        summary = analyze_results(results)
        summary["quality_score"] = quality_score_band(summary["success_rate"])
        metadata["duration_seconds"] = round(time.perf_counter() - t0, 3)
        return {
            "table_name": table_name,
            "results": results,
            "metadata": metadata,
            "summary": summary,
        }

    def run_complete_analysis(
        self,
        df: DataFrame,
        table_name: str,
        formats: tuple[str, ...] = ("json", "txt"),
    ) -> dict:
        """run_complete_analysis analogue (orchestrator.py:281-324):
        analyze + write all report formats."""
        analysis = self.analyze_table(df, table_name)
        paths = {}
        if "json" in formats:
            paths["json"] = write_json_report(
                analysis["results"],
                table_name,
                self.output_dir,
                metadata=analysis["metadata"],
            )
        if "txt" in formats:
            paths["txt"] = write_text_report(
                analysis["results"], table_name, self.output_dir
            )
        analysis["report_paths"] = paths
        return analysis
