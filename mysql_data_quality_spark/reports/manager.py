"""Unified report entry point — all formats under one timestamped basename
(reference ``core/report_manager.py:125-187`` ``generate_unified_report``).

One call writes ``<base>.json`` + ``<base>.txt`` + ``<base>.html`` so a run's
artifacts sort together; a format that fails does not abort the others
(reference behavior: warn and continue)."""

from __future__ import annotations

import logging
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, List, Optional

from mysql_data_quality_spark.core.types import RuleResult
from mysql_data_quality_spark.reports.html_report import write_html_report
from mysql_data_quality_spark.reports.summary import (
    write_json_report,
    write_text_report,
)

log = logging.getLogger(__name__)

_WRITERS = {
    "json": lambda res, tbl, out, meta, base: write_json_report(
        res, tbl, out, metadata=meta, base_name=base
    ),
    "txt": lambda res, tbl, out, meta, base: write_text_report(
        res, tbl, out, base_name=base
    ),
    "html": lambda res, tbl, out, meta, base: write_html_report(
        res, tbl, out, base_name=base, metadata=meta
    ),
}


def write_unified_report(
    results: List[RuleResult],
    table_name: str,
    output_dir: str | Path,
    metadata: Optional[Dict[str, Any]] = None,
    report_name: Optional[str] = None,
    formats: Optional[List[str]] = None,
) -> Dict[str, Path]:
    """Write every requested format under one shared basename.

    Returns {format: path} for the formats that succeeded (reference
    report_manager.py:148-160: per-format failures are logged, not raised).
    """
    formats = list(formats) if formats is not None else ["json", "txt", "html"]
    unknown = [f for f in formats if f not in _WRITERS]
    if unknown:
        raise ValueError(f"unknown report formats: {unknown}")
    ts = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    base = report_name or f"data_quality_unified_{table_name}_{ts}"
    written: Dict[str, Path] = {}
    for fmt in formats:
        try:
            written[fmt] = _WRITERS[fmt](
                results, table_name, output_dir, metadata, base
            )
        except Exception:  # pragma: no cover - defensive, mirrors reference
            log.exception("%s report failed for %s", fmt, table_name)
    return written
