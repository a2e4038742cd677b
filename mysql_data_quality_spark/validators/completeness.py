"""Completeness validator — null/missing-value checks.

Semantics match the reference
(``/root/reference/src/data_quality/validators/completeness.py:98-153``):
per column, ``completeness_ratio = non_null/total`` (1.0 for an empty
table), pass iff ratio >= threshold, ``affected_rows = null_count``,
threshold validated in [0, 1] fail-fast (completeness.py:113-117).

Spark design: the reference loops columns and recomputes per rule; here ALL
columns' null counts come from ONE ``df.agg`` pass (one scan, partial+final
aggregation — SURVEY.md A1), then rules are applied driver-side to the tiny
aggregate row.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_data_quality_spark.core.types import Rule, RuleResult, Severity


class CompletenessValidator:
    name = "completeness"
    description = "Validates data completeness by checking for null/missing values"

    def __init__(self) -> None:
        self._rules: List[Rule] = [
            Rule(
                name="default_completeness",
                description="Default completeness check requiring 95% non-null values",
                severity=Severity.WARNING,
                parameters={"threshold": 0.95},
                family=self.name,
            )
        ]

    def add_rule(self, rule: Rule) -> None:
        self._rules.append(rule)

    def get_rules(self) -> List[Rule]:
        return list(self._rules)

    def validate_table(
        self,
        df: DataFrame,
        table_name: str,
        rules: Optional[List[Rule]] = None,
        columns: Optional[List[str]] = None,
    ) -> List[RuleResult]:
        rules = rules if rules is not None else self.get_rules()
        rules = [r for r in rules if r.enabled]
        if not rules:
            return []
        for rule in rules:  # fail fast before launching a job
            thr = rule.parameters.get("threshold", 1.0)
            if not (0.0 <= thr <= 1.0):
                raise ValueError(
                    f"Rule '{rule.name}': threshold must be between 0.0 and 1.0, got {thr}"
                )

        cols = columns or df.columns
        # ONE aggregation over all columns: count(*) + per-column null counts
        aggs = [F.count(F.lit(1)).alias("__total")] + [
            F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols
        ]
        row = df.agg(*aggs).collect()[0].asDict()
        total = int(row["__total"])

        results: List[RuleResult] = []
        for c in cols:
            null_count = int(row[c] or 0)
            non_null = total - null_count
            ratio = (non_null / total) if total > 0 else 1.0
            for rule in rules:
                thr = float(rule.parameters.get("threshold", 1.0))
                passed = bool(ratio >= thr)
                cmp = ">=" if passed else "<"
                results.append(
                    RuleResult(
                        rule_name=rule.name,
                        table_name=table_name,
                        column_name=c,
                        severity=rule.severity,
                        passed=passed,
                        message=(
                            f"Column '{c}' has {ratio:.1%} completeness "
                            f"({cmp} {thr:.1%} required)"
                        ),
                        details={
                            "null_count": null_count,
                            "non_null_count": non_null,
                            "completeness_ratio": float(ratio),
                            "threshold": thr,
                            "null_percentage": float(
                                null_count / total * 100 if total > 0 else 0
                            ),
                        },
                        affected_rows=null_count,
                        total_rows=total,
                    )
                )
        return results
