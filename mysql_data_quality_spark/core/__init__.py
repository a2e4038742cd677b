from mysql_data_quality_spark.core.types import Rule, RuleResult, Severity
from mysql_data_quality_spark.core.engine import ValidationEngine
from mysql_data_quality_spark.core.session import get_spark

__all__ = ["Rule", "RuleResult", "Severity", "ValidationEngine", "get_spark"]
