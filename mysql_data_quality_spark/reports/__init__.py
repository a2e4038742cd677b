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
]
