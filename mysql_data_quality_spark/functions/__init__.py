from mysql_data_quality_spark.functions import checkdigits, text, urls

__all__ = ["text", "checkdigits", "urls"]
