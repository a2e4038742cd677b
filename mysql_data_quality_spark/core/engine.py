"""ValidationEngine — the registry/orchestration layer.

Mirrors the reference's ``ValidationEngine``
(``/root/reference/src/data_quality/validators/base.py:156-212``): a named
registry of validator families, ``validate_data`` running the selected ones,
and per-validator exception isolation into CRITICAL error results — but each
family here emits Spark jobs (usually a single ``df.agg`` pass) instead of
pandas loops.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Dict, List, Optional, Protocol

from pyspark.sql import DataFrame

from mysql_data_quality_spark.core.types import RuleResult, Severity


class Validator(Protocol):
    """A rule family: name + validate_table(df, table_name) -> results."""

    name: str

    def validate_table(
        self, df: DataFrame, table_name: str
    ) -> List[RuleResult]: ...


class ValidationEngine:
    def __init__(self) -> None:
        self._validators: Dict[str, Validator] = {}

    def register_validator(self, validator: Validator) -> None:
        self._validators[validator.name] = validator

    def get_validator(self, name: str) -> Optional[Validator]:
        return self._validators.get(name)

    def get_all_validators(self) -> Dict[str, Validator]:
        return dict(self._validators)

    def validate_data(
        self,
        df: DataFrame,
        table_name: str,
        validator_names: Optional[List[str]] = None,
    ) -> List[RuleResult]:
        """Run selected validators; isolate failures as CRITICAL results
        (reference base.py:194-210) — a failed rule family must not kill a
        10^12-row job."""
        results: List[RuleResult] = []
        to_run = (
            [self._validators[n] for n in validator_names if n in self._validators]
            if validator_names
            else list(self._validators.values())
        )
        for validator in to_run:
            try:
                results.extend(validator.validate_table(df, table_name))
            except Exception as e:  # noqa: BLE001 — deliberate isolation
                results.append(
                    RuleResult(
                        rule_name=f"{validator.name}_error",
                        table_name=table_name,
                        column_name=None,
                        severity=Severity.CRITICAL,
                        passed=False,
                        message=f"Validator {validator.name} failed: {e}",
                        details={"error": str(e)},
                        timestamp=datetime.now(timezone.utc),
                    )
                )
        return results
