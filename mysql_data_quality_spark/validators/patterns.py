"""Patterns validator — format checks (CNPJ, CPF, email, phone, CEP, custom).

Semantics match the reference
(``/root/reference/src/data_quality/validators/patterns.py``):
  * built-in pattern library with anchored regexes (patterns.py:30-56);
  * CPF/CNPJ use check-digit validators instead of regex-only
    (patterns.py:221-224, 298-364);
  * auto-detect of pattern type from the column name (patterns.py:277-296);
  * null/empty handling via ``allow_nulls`` (patterns.py:208-215);
  * values are trimmed strings before matching (patterns.py:217-218);
  * pass iff invalid_count == 0; up to 10 invalid samples;
  * per-rule errors isolated into failed results (patterns.py:129-144).

Spark design: the reference's per-row Python loop (patterns.py:208-231) —
the anti-pattern SURVEY.md §7.4(6) calls out — becomes native ``rlike``
Column predicates (JVM codegen) or Arrow pandas UDFs for check digits; all
counts come from one ``df.agg`` per column batch.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql_data_quality_spark.core.types import Rule, RuleResult, Severity
from mysql_data_quality_spark.functions import checkdigits

#: anchored regexes, verbatim semantics from the reference patterns.py:30-56
PATTERNS: Dict[str, dict] = {
    "cnpj": {
        "regex": r"^\d{2}\.?\d{3}\.?\d{3}\/?\d{4}-?\d{2}$",
        "description": "Brazilian CNPJ format",
        "validator": "cnpj",
    },
    "cpf": {
        "regex": r"^\d{3}\.?\d{3}\.?\d{3}-?\d{2}$",
        "description": "Brazilian CPF format",
        "validator": "cpf",
    },
    "email": {
        "regex": r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$",
        "description": "Email format",
        "validator": None,
    },
    "phone_br": {
        "regex": r"^(\(\d{2}\)\s?)?\d{4,5}-?\d{4}$",
        "description": "Brazilian phone format",
        "validator": None,
    },
    "cep": {
        "regex": r"^\d{5}-?\d{3}$",
        "description": "Brazilian CEP format",
        "validator": None,
    },
}

_CHECKDIGIT_UDFS: Dict[str, Callable[[], Column]] = {
    "cpf": checkdigits.cpf_valid_udf,
    "cnpj": checkdigits.cnpj_valid_udf,
}


def auto_detect_pattern(column_name: str) -> Optional[str]:
    """Column-name heuristic (reference patterns.py:277-296)."""
    low = column_name.lower()
    if "cnpj" in low:
        return "cnpj"
    if "cpf" in low:
        return "cpf"
    if "email" in low or "mail" in low:
        return "email"
    if "phone" in low or "telefone" in low or "fone" in low:
        return "phone_br"
    if "cep" in low:
        return "cep"
    return None


def valid_col(col: Column, pattern_type: str, regex: Optional[str] = None) -> Column:
    """Boolean validity Column for non-null values of `col`."""
    s = F.trim(col.cast("string"))
    if pattern_type in _CHECKDIGIT_UDFS:
        return _CHECKDIGIT_UDFS[pattern_type]()(s)
    r = regex if regex is not None else PATTERNS[pattern_type]["regex"]
    return s.rlike(r)


class PatternsValidator:
    name = "patterns"
    description = "Validates data format patterns (CNPJ, CPF, email, phone, etc.)"

    def __init__(self) -> None:
        self._rules: List[Rule] = [
            Rule(
                name="default_pattern_check",
                description="Default pattern validation",
                severity=Severity.INFO,
                parameters={"pattern_type": "auto_detect", "allow_nulls": True},
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
        results: List[RuleResult] = []
        for c in columns or df.columns:
            for rule in rules:
                try:
                    results.append(
                        self._validate_pattern(df, table_name, c, rule)
                    )
                except Exception as e:  # noqa: BLE001 — per-rule isolation
                    results.append(
                        RuleResult(
                            rule_name=rule.name,
                            table_name=table_name,
                            column_name=c,
                            severity=rule.severity,
                            passed=False,
                            message=f"Pattern validation failed: {e}",
                            details={"error": str(e)},
                            affected_rows=0,
                            total_rows=df.count(),
                        )
                    )
        return results

    def _validate_pattern(
        self, df: DataFrame, table_name: str, column_name: str, rule: Rule
    ) -> RuleResult:
        params = rule.parameters
        pattern_type = params.get("pattern_type", "auto_detect")
        allow_nulls = params.get("allow_nulls", True)

        if pattern_type == "auto_detect":
            detected = auto_detect_pattern(column_name)
            if not detected:
                return RuleResult(
                    rule_name=rule.name,
                    table_name=table_name,
                    column_name=column_name,
                    severity=rule.severity,
                    passed=True,
                    message=f"No specific pattern detected for column '{column_name}'",
                    details={
                        "pattern_type": "none",
                        "auto_detected": True,
                        "column_name": column_name,
                    },
                    affected_rows=0,
                    total_rows=df.count(),
                )
            pattern_type = detected

        if pattern_type == "regex":
            regex = params.get("regex_pattern")
            if not regex:
                raise ValueError(
                    "regex_pattern parameter is required for custom regex validation"
                )
            description = params.get("description", "Custom regex pattern")
            validity = valid_col(F.col(column_name), "regex", regex)
        elif pattern_type in PATTERNS:
            regex = PATTERNS[pattern_type]["regex"]
            description = PATTERNS[pattern_type]["description"]
            validity = valid_col(F.col(column_name), pattern_type)
        else:
            raise ValueError(f"Unsupported pattern type: {pattern_type}")

        # null-or-empty mirrors the reference's `pd.isna(v) or v == ""`
        is_nullish = F.col(column_name).isNull() | (
            F.col(column_name).cast("string") == ""
        )
        # one agg pass: total, nullish count, invalid-non-null count
        row = df.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(is_nullish.cast("long")).alias("nulls"),
            F.sum((~is_nullish & ~validity).cast("long")).alias("invalid_nn"),
        ).collect()[0]
        total = int(row["total"])
        null_count = int(row["nulls"] or 0)
        invalid_nn = int(row["invalid_nn"] or 0)
        invalid_count = invalid_nn + (null_count if not allow_nulls else 0)
        valid_count = total - invalid_count

        samples: List[str] = []
        if invalid_nn > 0:
            samples = [
                r[0]
                for r in df.where(~is_nullish & ~validity)
                .select(F.trim(F.col(column_name).cast("string")))
                .limit(10)
                .collect()
            ]
        if not allow_nulls and null_count > 0:
            samples = samples[:10]

        passed = invalid_count == 0
        if passed:
            if null_count > 0 and allow_nulls:
                message = (
                    f"All {valid_count - null_count} non-null values match "
                    f"{pattern_type} pattern ({null_count} nulls allowed)"
                )
            else:
                message = f"All {valid_count} values match {pattern_type} pattern"
        else:
            issues = []
            if invalid_nn > 0:
                issues.append(f"{invalid_nn} invalid format")
            if null_count > 0 and not allow_nulls:
                issues.append(f"{null_count} null values")
            message = f"Pattern validation failed: {', '.join(issues)}"

        return RuleResult(
            rule_name=rule.name,
            table_name=table_name,
            column_name=column_name,
            severity=rule.severity,
            passed=bool(passed),
            message=message,
            details={
                "pattern_type": pattern_type,
                "pattern_description": description,
                "regex_pattern": regex,
                "valid_count": valid_count,
                "invalid_count": invalid_count,
                "null_count": null_count,
                "allow_nulls": allow_nulls,
                "invalid_values": samples,
                "validity_ratio": float(valid_count / total) if total > 0 else 1.0,
            },
            affected_rows=invalid_count,
            total_rows=total,
        )
