from mysql_data_quality_spark.operators import ann, dedup, multimodal, textstats

__all__ = ["ann", "dedup", "multimodal", "textstats"]
