from mysql_data_quality_spark.validators.completeness import CompletenessValidator
from mysql_data_quality_spark.validators.duplicates import DuplicatesValidator
from mysql_data_quality_spark.validators.patterns import PatternsValidator
from mysql_data_quality_spark.validators.integrity import IntegrityValidator

__all__ = [
    "CompletenessValidator",
    "DuplicatesValidator",
    "PatternsValidator",
    "IntegrityValidator",
]
