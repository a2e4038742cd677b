"""mysql_data_quality_spark — a PySpark-native data-quality / web-document
quality-filter engine.

A from-scratch re-expression of the capabilities of
``MateusFenoci/mysql-data-quality`` (reference at ``/root/reference``, studied
for semantics only) as idiomatic PySpark: rule registries compile to a single
DataFrame plan (one scan), per-column metrics come from one ``df.agg`` pass,
FK checks are broadcast anti-joins, pattern checks are native ``rlike`` /
Arrow-batched pandas UDFs, and the whole thing generalizes to the web-scale
quality-filter pipeline described in ``BASELINE.json`` (langid, perplexity,
Gopher/C4 heuristics, PII/toxicity scrub, keep/drop + scrubbed text).
"""

from mysql_data_quality_spark.core.types import (
    Rule,
    RuleResult,
    Severity,
)
from mysql_data_quality_spark.core.engine import ValidationEngine

__version__ = "0.1.0"

__all__ = [
    "Rule",
    "RuleResult",
    "Severity",
    "ValidationEngine",
    "__version__",
]
