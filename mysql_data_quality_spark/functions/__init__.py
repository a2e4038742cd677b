from mysql_data_quality_spark.functions import checkdigits, text

__all__ = ["text", "checkdigits"]
