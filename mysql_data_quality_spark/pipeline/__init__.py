from mysql_data_quality_spark.pipeline import pages, quality_filter

__all__ = ["pages", "quality_filter"]
