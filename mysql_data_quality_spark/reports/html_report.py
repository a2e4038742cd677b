"""HTML report sink — severity-sectioned report matching the reference's
HTML generator surface (``/root/reference/src/data_quality/reports/
html_report.py:14-117`` and its section builders, 120-260): summary cards,
validator breakdown, severity breakdown, per-severity result sections with
per-result detail, and a metadata footer panel.  Driver-side render of the
tiny metrics rows (the distributed outputs stay in parquet)."""

from __future__ import annotations

import html
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, List, Optional

from mysql_data_quality_spark.core.types import SEVERITY_PRIORITY, RuleResult
from mysql_data_quality_spark.reports.summary import (
    analyze_results,
    quality_score_band,
)

_CSS = """
body{font-family:sans-serif;margin:2em;color:#222;max-width:70em}
h1{border-bottom:2px solid #444}
.timestamp{color:#777}
.badge{padding:2px 8px;border-radius:4px;color:#fff;font-size:0.85em}
.pass{background:#2e7d32}.fail{background:#c62828}
.CRITICAL{border-left:6px solid #b71c1c}.ERROR{border-left:6px solid #e65100}
.WARNING{border-left:6px solid #f9a825}.INFO{border-left:6px solid #1565c0}
.result{margin:6px 0;padding:8px;background:#f5f5f5}
.details{color:#555;font-size:0.9em;margin-top:4px}
.score{font-size:1.3em;font-weight:bold}
.cards{display:flex;gap:12px;margin:8px 0}
.card{border:1px solid #ccc;border-radius:6px;padding:8px 16px;text-align:center}
.card .metric{font-size:1.5em;font-weight:bold}
.card.success .metric{color:#2e7d32}.card.error .metric{color:#c62828}
table{border-collapse:collapse;margin:8px 0}
td,th{padding:4px 10px;border:1px solid #ccc}
footer{margin-top:2em;color:#777;border-top:1px solid #ccc}
"""

#: severity section order + display title (reference html_report.py:99-106)
_SECTIONS = (
    ("CRITICAL", "Critical Issues"),
    ("ERROR", "Errors"),
    ("WARNING", "Warnings"),
    ("INFO", "Information"),
)


def _summary_cards(summary: Dict[str, Any]) -> str:
    cards = (
        ("Total Checks", summary["total_checks"], ""),
        ("Passed", summary["passed_checks"], " success"),
        ("Failed", summary["failed_checks"], " error"),
        ("Success Rate", f"{summary['success_rate']:.1f}%", ""),
    )
    inner = "".join(
        f"<div class='card{cls}'><h4>{title}</h4>"
        f"<div class='metric'>{val}</div></div>"
        for title, val, cls in cards
    )
    return f"<section><h3>Summary</h3><div class='cards'>{inner}</div></section>"


def _breakdown_table(title: str, breakdown: Dict[str, Dict[str, int]]) -> str:
    """Validator/severity breakdown tables (reference html_report.py:132-220)."""
    if not breakdown:
        return ""
    rows = "".join(
        f"<tr><td>{html.escape(name)}</td><td>{c['total']}</td>"
        f"<td>{c['passed']}</td><td>{c['failed']}</td></tr>"
        for name, c in breakdown.items()
    )
    return (
        f"<section><h3>{title}</h3><table>"
        "<tr><th>name</th><th>total</th><th>passed</th><th>failed</th></tr>"
        f"{rows}</table></section>"
    )


def _result_div(r: RuleResult) -> str:
    badge = "pass" if r.passed else "fail"
    col = f"[{html.escape(str(r.column_name))}] " if r.column_name else ""
    details = ""
    if r.details:
        items = ", ".join(
            f"{html.escape(str(k))}: {html.escape(str(v))}"
            for k, v in sorted(r.details.items())
        )
        details = f"<div class='details'>{items}</div>"
    return (
        f"<div class='result {r.severity.value}'>"
        f"<span class='badge {badge}'>{badge.upper()}</span> "
        f"{col}<b>{html.escape(r.rule_name)}</b> — "
        f"{html.escape(r.message)} "
        f"({r.affected_rows:,}/{r.total_rows:,} rows, "
        f"{r.pass_rate:.1f}% pass rate){details}</div>"
    )


def _metadata_panel(metadata: Optional[Dict[str, Any]]) -> str:
    """Reference _format_metadata (html_report.py:119-130): one line of
    ``key: value`` pairs, None rendered as N/A."""
    if not metadata:
        return ""
    items = ", ".join(
        f"{html.escape(str(k))}: "
        f"{html.escape(str(v)) if v is not None else 'N/A'}"
        for k, v in metadata.items()
    )
    return f"<p>Metadata: {items}</p>"


def write_html_report(
    results: List[RuleResult],
    table_name: str,
    output_dir: str | Path,
    base_name: str | None = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> Path:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    ts = datetime.now(timezone.utc)
    path = (
        out
        / f"{base_name or f'quality_report_{table_name}_{ts:%Y%m%d_%H%M%S}'}.html"
    )

    summary = analyze_results(results)
    band = quality_score_band(summary["success_rate"])
    parts = [
        "<!doctype html><html lang='en'><head><meta charset='utf-8'>",
        f"<title>Data Quality — {html.escape(table_name)}</title>",
        f"<style>{_CSS}</style></head><body>",
        "<header><h1>Data Quality Report — "
        f"{html.escape(table_name)}</h1>",
        f"<p class='timestamp'>Generated on {ts:%Y-%m-%d %H:%M:%S} UTC</p>",
        f"<p class='score'>Quality score: {band} "
        f"({summary['success_rate']:.1f}% checks passed)</p></header>",
        _summary_cards(summary),
        _breakdown_table(
            "Validator Breakdown", summary["validator_breakdown"]
        ),
        _breakdown_table("Severity Breakdown", summary["severity_breakdown"]),
    ]
    by_sev = sorted(
        results, key=lambda r: (SEVERITY_PRIORITY.get(r.severity, 4), r.rule_name)
    )
    for sev, title in _SECTIONS:
        sec = [r for r in by_sev if r.severity.value == sev]
        if not sec:
            continue
        parts.append(f"<h2>{sev}</h2><p>{title}</p>")
        parts.extend(_result_div(r) for r in sec)
    parts.append(f"<footer><p>Report generated by mysql_data_quality_spark"
                 f"</p>{_metadata_panel(metadata)}</footer>")
    parts.append("</body></html>")
    path.write_text("\n".join(parts))
    return path
