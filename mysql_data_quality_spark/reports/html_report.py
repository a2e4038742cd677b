"""HTML report sink — severity-sectioned report matching the reference's
HTML generator surface (``/root/reference/src/data_quality/reports/
html_report.py:14-117``): summary header, quality-score banner, results
grouped by severity, pass/fail badges.  Driver-side render of the tiny
metrics rows (the distributed outputs stay in parquet)."""

from __future__ import annotations

import html
from datetime import datetime, timezone
from pathlib import Path
from typing import List

from mysql_data_quality_spark.core.types import SEVERITY_PRIORITY, RuleResult
from mysql_data_quality_spark.reports.summary import (
    analyze_results,
    quality_score_band,
)

_CSS = """
body{font-family:sans-serif;margin:2em;color:#222}
h1{border-bottom:2px solid #444}
.badge{padding:2px 8px;border-radius:4px;color:#fff;font-size:0.85em}
.pass{background:#2e7d32}.fail{background:#c62828}
.CRITICAL{border-left:6px solid #b71c1c}.ERROR{border-left:6px solid #e65100}
.WARNING{border-left:6px solid #f9a825}.INFO{border-left:6px solid #1565c0}
.result{margin:6px 0;padding:8px;background:#f5f5f5}
.score{font-size:1.3em;font-weight:bold}
table{border-collapse:collapse}td,th{padding:4px 10px;border:1px solid #ccc}
"""


def write_html_report(
    results: List[RuleResult],
    table_name: str,
    output_dir: str | Path,
    base_name: str | None = None,
) -> Path:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    ts = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    path = out / f"{base_name or f'quality_report_{table_name}_{ts}'}.html"

    summary = analyze_results(results)
    band = quality_score_band(summary["success_rate"])
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>Data Quality — {html.escape(table_name)}</title>",
        f"<style>{_CSS}</style></head><body>",
        f"<h1>Data Quality Report — {html.escape(table_name)}</h1>",
        f"<p class='score'>Quality score: {band} "
        f"({summary['success_rate']:.1f}% checks passed)</p>",
        "<table><tr><th>total</th><th>passed</th><th>failed</th></tr>",
        f"<tr><td>{summary['total_checks']}</td>"
        f"<td>{summary['passed_checks']}</td>"
        f"<td>{summary['failed_checks']}</td></tr></table>",
    ]
    by_sev = sorted(
        results, key=lambda r: (SEVERITY_PRIORITY.get(r.severity, 4), r.rule_name)
    )
    current = None
    for r in by_sev:
        if r.severity.value != current:
            current = r.severity.value
            parts.append(f"<h2>{current}</h2>")
        badge = "pass" if r.passed else "fail"
        col = f"[{html.escape(str(r.column_name))}] " if r.column_name else ""
        parts.append(
            f"<div class='result {current}'>"
            f"<span class='badge {badge}'>{badge.upper()}</span> "
            f"{col}<b>{html.escape(r.rule_name)}</b> — "
            f"{html.escape(r.message)} "
            f"({r.affected_rows:,}/{r.total_rows:,} rows, "
            f"{r.pass_rate:.1f}% pass rate)</div>"
        )
    parts.append("</body></html>")
    path.write_text("\n".join(parts))
    return path
