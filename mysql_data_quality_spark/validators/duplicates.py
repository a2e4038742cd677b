"""Duplicates validator — per-column and composite-key uniqueness.

Semantics match the reference
(``/root/reference/src/data_quality/validators/duplicates.py``):
  * per column: ``duplicate_count = total - distinct`` where, under
    ``ignore_nulls=True`` (default), nulls are dropped first; under
    ``False`` nulls count as one value group (duplicates.py:264-282);
  * composite keys: rows with any null key column are dropped under
    ``ignore_nulls``; dup count = rows - distinct combos
    (duplicates.py:341-429);
  * column-name skip/force heuristics — FK/UUID-ish names are skipped
    unless force-matched (duplicates.py:431-460);
  * up to 10 sample duplicate values / 5 sample combos.

Spark design: ALL per-column exact distinct counts in ONE ``df.agg`` pass
(count + count(col) + count_distinct per column — map-side partial agg).
Exact counts preserve reference verdict semantics (SURVEY.md A2);
``approx=True`` switches to HLL ``approx_count_distinct`` for the 10^12-row
scale path where an exact global distinct per column would be a huge
shuffle.  Samples are separate tiny top-k jobs, only run for columns that
actually have duplicates.
"""

from __future__ import annotations

from typing import Any, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_data_quality_spark.core.types import Rule, RuleResult, Severity

#: column-name substrings expected to repeat (skipped), mirroring the
#: reference's env-default skip list (.env.example:22-31, duplicates.py:45-152)
DEFAULT_SKIP_PATTERNS = (
    "_id",
    "_key",
    "_fk",
    "id_",
    "fk_",
    "ref_",
    "type",
    "status",
    "category",
    "flag",
)
#: substrings that force validation even if a skip pattern matches
DEFAULT_FORCE_PATTERNS = ("cpf", "cnpj", "email", "uuid", "unique")


class DuplicatesValidator:
    name = "duplicates"
    description = "Validates uniqueness of column values and composite keys"

    def __init__(
        self,
        skip_patterns: tuple[str, ...] = DEFAULT_SKIP_PATTERNS,
        force_patterns: tuple[str, ...] = DEFAULT_FORCE_PATTERNS,
        approx: bool = False,
        sample_limit: int = 10,
        force_columns: tuple[str, ...] = (),
        allow_columns: tuple[str, ...] = (),
    ) -> None:
        """``force_columns`` / ``allow_columns`` are exact (case-sensitive)
        column names that override the substring heuristics — the reference's
        FORCE_UNIQUE_COLUMNS / ALLOW_DUPLICATE_COLUMNS env lists
        (.env.example:33-37, duplicates.py:431-460)."""
        self._rules: List[Rule] = [
            Rule(
                name="default_duplicates",
                description="Default duplicate check allowing no duplicates",
                severity=Severity.WARNING,
                parameters={"max_duplicates": 0, "ignore_nulls": True},
                family=self.name,
            )
        ]
        self.skip_patterns = skip_patterns
        self.force_patterns = force_patterns
        self.force_columns = force_columns
        self.allow_columns = allow_columns
        self.approx = approx
        self.sample_limit = sample_limit

    def add_rule(self, rule: Rule) -> None:
        self._rules.append(rule)

    def get_rules(self) -> List[Rule]:
        return list(self._rules)

    def should_skip_column(self, column_name: str) -> bool:
        """Name-heuristic binding (reference duplicates.py:431-460).
        Exact-name lists win over substring patterns; force wins over allow."""
        if column_name in self.force_columns:
            return False
        if column_name in self.allow_columns:
            return True
        low = column_name.lower()
        if any(p in low for p in self.force_patterns):
            return False
        return any(p in low for p in self.skip_patterns)

    # ------------------------------------------------------------------
    def validate_table(
        self,
        df: DataFrame,
        table_name: str,
        rules: Optional[List[Rule]] = None,
        columns: Optional[List[str]] = None,
        with_samples: bool = True,
    ) -> List[RuleResult]:
        rules = rules if rules is not None else self.get_rules()
        rules = [r for r in rules if r.enabled]
        if not rules:
            return []

        column_rules = [r for r in rules if "columns" not in r.parameters]
        composite_rules = [r for r in rules if "columns" in r.parameters]
        for r in rules:
            mx = r.parameters.get("max_duplicates", 0)
            if not isinstance(mx, int) or mx < 0:
                raise ValueError(
                    f"Rule '{r.name}': max_duplicates must be >= 0, got {mx}"
                )

        results: List[RuleResult] = []
        if column_rules:
            cols = [
                c
                for c in (columns or df.columns)
                if not self.should_skip_column(c)
            ]
            if cols:
                results.extend(
                    self._validate_columns(
                        df, table_name, cols, column_rules, with_samples
                    )
                )
        for rule in composite_rules:
            results.append(self._validate_composite(df, table_name, rule))
        return results

    # ------------------------------------------------------------------
    def _distinct_agg(self, col: str, dropna: bool):
        if self.approx:
            base = F.approx_count_distinct(col)
        else:
            base = F.count_distinct(F.col(col))
        if dropna:
            return base
        # count_distinct ignores nulls; add 1 if any null present to treat
        # null as a value group (pandas nunique(dropna=False) semantics,
        # reference duplicates.py:276-281)
        return base + F.max(F.col(col).isNull().cast("long"))

    def _validate_columns(
        self,
        df: DataFrame,
        table_name: str,
        cols: List[str],
        rules: List[Rule],
        with_samples: bool,
    ) -> List[RuleResult]:
        # one agg pass: total rows, per-column non-null counts, per-column
        # distinct counts under both null modes
        aggs: list = [F.count(F.lit(1)).alias("__total")]
        for c in cols:
            aggs.append(F.count(F.col(c)).alias(f"__nn__{c}"))
            aggs.append(self._distinct_agg(c, dropna=True).alias(f"__dt__{c}"))
            aggs.append(self._distinct_agg(c, dropna=False).alias(f"__df__{c}"))
        row = df.agg(*aggs).collect()[0].asDict()
        total = int(row["__total"])

        results: List[RuleResult] = []
        for c in cols:
            non_null = int(row[f"__nn__{c}"] or 0)
            for rule in rules:
                max_dup = int(rule.parameters.get("max_duplicates", 0))
                ignore_nulls = bool(rule.parameters.get("ignore_nulls", True))
                if ignore_nulls:
                    unique_count = int(row[f"__dt__{c}"] or 0)
                    total_count = non_null
                else:
                    unique_count = int(row[f"__df__{c}"] or 0)
                    total_count = total
                dup_count = total_count - unique_count
                passed = bool(dup_count <= max_dup)

                samples: List[Any] = []
                if with_samples and dup_count > 0:
                    base = df.select(c)
                    if ignore_nulls:
                        base = base.where(F.col(c).isNotNull())
                    samples = [
                        r[0]
                        for r in base.groupBy(c)
                        .count()
                        .where(F.col("count") > 1)
                        .orderBy(F.desc("count"), F.col(c))
                        .limit(self.sample_limit)
                        .collect()
                    ]

                if passed and dup_count == 0:
                    message = f"Column '{c}' has no duplicate values"
                elif passed:
                    message = (
                        f"Column '{c}' has {dup_count} duplicate values "
                        f"(<= {max_dup} allowed)"
                    )
                else:
                    message = (
                        f"Column '{c}' has {dup_count} duplicate values "
                        f"(> {max_dup} allowed)"
                    )
                results.append(
                    RuleResult(
                        rule_name=rule.name,
                        table_name=table_name,
                        column_name=c,
                        severity=rule.severity,
                        passed=passed,
                        message=message,
                        details={
                            "unique_count": unique_count,
                            "duplicate_count": dup_count,
                            "total_rows": total,
                            "non_null_rows": non_null,
                            "duplicate_values": samples,
                            "max_duplicates": max_dup,
                            "ignore_nulls": ignore_nulls,
                        },
                        affected_rows=dup_count,
                        total_rows=total,
                    )
                )
        return results

    # ------------------------------------------------------------------
    def _validate_composite(
        self, df: DataFrame, table_name: str, rule: Rule
    ) -> RuleResult:
        cols = rule.parameters["columns"]
        max_dup = int(rule.parameters.get("max_duplicates", 0))
        ignore_nulls = bool(rule.parameters.get("ignore_nulls", True))
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"Rule '{rule.name}': columns {missing} not found in data"
            )

        key = df.select(*cols)
        no_null = F.lit(True)
        for c in cols:
            no_null = no_null & F.col(c).isNotNull()
        # one agg: table rows, any-null-free key rows, distinct key combos
        # (count_distinct over multiple cols already skips any-null rows)
        agg = key.agg(
            F.count(F.lit(1)).alias("all_rows"),
            F.sum(no_null.cast("long")).alias("t_nonnull"),
            F.count_distinct(*[F.col(c) for c in cols]).alias("d"),
        ).collect()[0]
        all_rows = int(agg["all_rows"])
        unique_count = int(agg["d"] or 0)
        total_rows = int(agg["t_nonnull"] or 0) if ignore_nulls else all_rows
        if not ignore_nulls:
            # add back the distinct null-containing combos
            null_combos = (
                key.where(~no_null).distinct().count() if all_rows else 0
            )
            unique_count += int(null_combos)
        dup_count = total_rows - unique_count
        if ignore_nulls:
            key = key.na.drop(subset=list(cols))
        passed = bool(dup_count <= max_dup)

        samples: list = []
        if dup_count > 0:
            samples = [
                tuple(r[c] for c in cols)
                for r in key.groupBy(*cols)
                .count()
                .where(F.col("count") > 1)
                .orderBy(F.desc("count"), *[F.col(c) for c in cols])
                .limit(5)
                .collect()
            ]

        columns_str = ", ".join(cols)
        if passed and dup_count == 0:
            message = f"Composite key ({columns_str}) has no duplicate combinations"
        elif passed:
            message = (
                f"Composite key ({columns_str}) has {dup_count} duplicate "
                f"combinations (<= {max_dup} allowed)"
            )
        else:
            message = (
                f"Composite key ({columns_str}) has {dup_count} duplicate "
                f"combinations (> {max_dup} allowed)"
            )
        return RuleResult(
            rule_name=rule.name,
            table_name=table_name,
            column_name=None,
            severity=rule.severity,
            passed=passed,
            message=message,
            details={
                "composite_key_columns": list(cols),
                "unique_combinations": unique_count,
                "duplicate_combinations": dup_count,
                "total_combinations": total_rows,
                "sample_duplicates": samples,
                "max_duplicates": max_dup,
                "ignore_nulls": ignore_nulls,
            },
            affected_rows=dup_count,
            total_rows=all_rows,  # reference passes len(data) here
        )
