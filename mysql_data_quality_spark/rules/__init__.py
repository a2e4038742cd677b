from mysql_data_quality_spark.rules import heuristics, langid, perplexity, pii

__all__ = ["heuristics", "langid", "perplexity", "pii"]
