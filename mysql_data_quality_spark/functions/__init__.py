from mysql_data_quality_spark.functions import text, checkdigits, hashing, similarity

__all__ = ["text", "checkdigits", "hashing", "similarity"]
