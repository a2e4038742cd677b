"""Rule-registry -> logical-plan compiler, plus the scan-planning utilities
from the reference's orchestration layer (sampling, volumetry).

The reference's "plan" is a literal SQL string + sequential pandas passes
(SURVEY.md §3.1 step 3-6).  Here the plan IS the DataFrame: ``compile_plan``
stitches every enabled rule family into one projection and returns it
unexecuted, so Catalyst sees the whole thing (one scan, fused codegen) and
callers choose the action (write, agg, collect).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_data_quality_spark.pipeline import quality_filter as QF


@dataclass
class CompiledPlan:
    """The compiled validation map + introspection helpers."""

    df: DataFrame
    rule_names: tuple[str, ...] = field(default_factory=tuple)

    def explain_str(self, mode: str = "formatted") -> str:
        return formatted_plan(self.df, mode)

    def scan_columns(self) -> list[str]:
        """Columns that actually reach the scan (pruning check)."""
        import re

        plan = self.explain_str()
        m = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        cols: list[str] = []
        for grp in m:
            cols += [c.split(":")[0] for c in grp.split(",") if c]
        return cols


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Full (untruncated) physical plan text — `executedPlan().toString()`
    truncates field lists in Spark 4."""
    spark = df.sparkSession
    explain_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(explain_mode)


def compile_plan(pages: DataFrame, use_arrow_udfs: bool = False) -> CompiledPlan:
    from mysql_data_quality_spark.rules import heuristics

    ann = QF.annotate(pages, use_arrow_udfs=use_arrow_udfs)
    return CompiledPlan(
        df=ann, rule_names=tuple(sorted(heuristics.all_rule_severities()))
    )


# ---------------------------------------------------------------------------
# scan planning utilities (reference cli.py:235-246, orchestrator.py:183-194)
# ---------------------------------------------------------------------------


def plan_scan(df: DataFrame, sample_size: int | None, seed: int = 42) -> DataFrame:
    """Count-gated sampling.  The reference issues
    ``SELECT * FROM t ORDER BY RAND() LIMIT n`` — a FULL SORT in the source
    DB (SURVEY.md §4.1 calls this out).  Spark-first: seeded ``sample`` by
    fraction is O(scan) with no sort; we oversample slightly then limit to
    hit the exact budget deterministically."""
    if sample_size is None:
        return df
    total = df.count()
    if total <= sample_size:
        return df
    fraction = min(1.0, (sample_size / total) * 1.1)
    return df.sample(fraction=fraction, seed=seed).limit(sample_size)


def volumetry(df: DataFrame, sampled: DataFrame | None = None) -> dict:
    """Volume metrics (reference core/volumetry_calculator.py:15-46,75-92).
    pandas deep-memory has no Spark analogue; we report row/col/data-point
    counts and the sampling ratio."""
    total = df.count()
    n_cols = len(df.columns)
    analyzed = sampled.count() if sampled is not None else total
    return {
        "total_rows": total,
        "total_columns": n_cols,
        "data_points": total * n_cols,
        "analyzed_rows": analyzed,
        "sampling_ratio": (analyzed / total) if total else 1.0,
        "dtypes": {f.name: f.dataType.simpleString() for f in df.schema.fields},
    }
