from mysql_data_quality_spark.reports.html_report import write_html_report
from mysql_data_quality_spark.reports.manager import write_unified_report
from mysql_data_quality_spark.reports.summary import (
    analyze_results,
    quality_score_band,
    top_issues,
    write_json_report,
    write_text_report,
)

__all__ = [
    "analyze_results",
    "quality_score_band",
    "top_issues",
    "write_json_report",
    "write_text_report",
    "write_html_report",
    "write_unified_report",
]
