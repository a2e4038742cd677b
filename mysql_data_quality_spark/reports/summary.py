"""Report aggregation + JSON/TXT sinks.

Reproduces the reference's summary schema:
  * :func:`analyze_results` ≅ ``ReportGenerator._analyze_results``
    (``/root/reference/src/data_quality/reports/base.py:28-105``) —
    total/passed/failed, success rate, breakdowns by severity and by
    validator family.  The reference infers the family from rule-name
    substrings (base.py:60-96); our RuleResults carry it in rule metadata,
    but the substring fallback is kept for foreign results.
  * :func:`top_issues` — failed results sorted by (severity priority,
    -affected_rows), top 10 (summary_report.py:98-124).
  * :func:`quality_score_band` — EXCELLENT/GOOD/FAIR/POOR/CRITICAL bands
    (summary_report.py:136-147).

The metrics input is a *small* list (one row per rule), so aggregation is
driver-side; at scale the per-document outputs stay distributed and only
these per-rule rows are collected.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, List, Optional

from mysql_data_quality_spark.core.types import (
    SEVERITY_PRIORITY,
    RuleResult,
)


def _validator_type(rule_name: str) -> str:
    """Substring inference, verbatim semantics from reports/base.py:60-96."""
    low = rule_name.lower()
    if "completeness" in low:
        return "completeness"
    if "uniqueness" in low or "duplicate" in low:
        return "duplicates"
    if (
        "integrity" in low
        or "referential" in low
        or "fk_" in low
        or low.startswith("auto_fk")
    ):
        return "integrity"
    if "pattern" in low or any(p in low for p in ("cnpj", "cpf", "email")):
        return "patterns"
    return "unknown"


def analyze_results(results: List[RuleResult]) -> Dict[str, Any]:
    if not results:
        return {
            "total_checks": 0,
            "passed_checks": 0,
            "failed_checks": 0,
            "success_rate": 100.0,
            "severity_breakdown": {},
            "validator_breakdown": {},
        }
    total = len(results)
    passed = sum(1 for r in results if r.passed)
    sev: Dict[str, Dict[str, int]] = {}
    val: Dict[str, Dict[str, int]] = {}
    for r in results:
        s = sev.setdefault(
            r.severity.value, {"total": 0, "passed": 0, "failed": 0}
        )
        s["total"] += 1
        s["passed" if r.passed else "failed"] += 1
        v = val.setdefault(
            _validator_type(r.rule_name), {"total": 0, "passed": 0, "failed": 0}
        )
        v["total"] += 1
        v["passed" if r.passed else "failed"] += 1
    return {
        "total_checks": total,
        "passed_checks": passed,
        "failed_checks": total - passed,
        "success_rate": (passed / total) * 100 if total > 0 else 100.0,
        "severity_breakdown": sev,
        "validator_breakdown": val,
    }


def top_issues(results: List[RuleResult], k: int = 10) -> List[RuleResult]:
    failed = [r for r in results if not r.passed]
    return sorted(
        failed,
        key=lambda r: (SEVERITY_PRIORITY.get(r.severity, 4), -r.affected_rows),
    )[:k]


def quality_score_band(success_rate: float) -> str:
    if success_rate >= 95:
        return "EXCELLENT"
    if success_rate >= 85:
        return "GOOD"
    if success_rate >= 70:
        return "FAIR"
    if success_rate >= 50:
        return "POOR"
    return "CRITICAL"


def write_json_report(
    results: List[RuleResult],
    table_name: str,
    output_dir: str | Path,
    metadata: Optional[Dict[str, Any]] = None,
    base_name: Optional[str] = None,
) -> Path:
    """Timestamped JSON report (reference reports/json_report.py:15-47)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    ts = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    path = out / f"{base_name or f'quality_report_{table_name}_{ts}'}.json"
    payload = {
        "table_name": table_name,
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "metadata": metadata or {},
        "summary": analyze_results(results),
        "quality_score": quality_score_band(
            analyze_results(results)["success_rate"]
        ),
        "results": [r.to_dict() for r in results],
    }
    path.write_text(json.dumps(payload, indent=2))
    return path


def write_text_report(
    results: List[RuleResult],
    table_name: str,
    output_dir: str | Path,
    base_name: Optional[str] = None,
) -> Path:
    """Plain-text summary (reference reports/summary_report.py:14-134)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    ts = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    path = out / f"{base_name or f'quality_summary_{table_name}_{ts}'}.txt"
    summary = analyze_results(results)
    lines = [
        "=" * 50,
        f"DATA QUALITY SUMMARY — {table_name}",
        "=" * 50,
        f"total checks : {summary['total_checks']}",
        f"passed       : {summary['passed_checks']}",
        f"failed       : {summary['failed_checks']}",
        f"success rate : {summary['success_rate']:.1f}%",
        f"quality score: {quality_score_band(summary['success_rate'])}",
        "",
        "BY SEVERITY",
    ]
    for s, counts in sorted(summary["severity_breakdown"].items()):
        lines.append(
            f"  {s:<9} total={counts['total']} passed={counts['passed']} "
            f"failed={counts['failed']}"
        )
    lines.append("")
    lines.append("TOP ISSUES")
    for i, r in enumerate(top_issues(results), 1):
        col = f"[{r.column_name}] " if r.column_name else ""
        lines.append(f"{i:2}. {r.severity.value} {col}{r.rule_name}")
        lines.append(f"    {r.message}")
        if r.affected_rows > 0:
            lines.append(
                f"    {r.affected_rows:,} / {r.total_rows:,} rows affected "
                f"({r.pass_rate:.1f}% pass rate)"
            )
    path.write_text("\n".join(lines) + "\n")
    return path
