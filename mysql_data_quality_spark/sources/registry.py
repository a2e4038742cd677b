"""Source/sink format registry — the Spark analogue of the reference's
connector factory (``/root/reference/src/data_quality/connectors/factory.py:
16-46``: driver-string -> connector class, with runtime registration).

Five SQL dialect connectors in the reference collapse to format options
here (SURVEY.md S6): Spark's DataSource abstraction is the dialect layer.
Iceberg is registered but gated on the runtime actually having the catalog
jars (not present in this sandbox); parquet is the tested default.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession


class UnknownFormatError(ValueError):
    pass


_READERS: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def register_reader(
    name: str,
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        _READERS[name] = fn
        return fn

    return deco


def create_reader(name: str) -> Callable[[SparkSession, str], DataFrame]:
    """factory.create_connector analogue (factory.py:27-34)."""
    if name not in _READERS:
        raise UnknownFormatError(
            f"Unsupported format: {name}. Registered: {sorted(_READERS)}"
        )
    return _READERS[name]


def registered_formats() -> list[str]:
    return sorted(_READERS)


@register_reader("parquet")
def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


@register_reader("json")
def _read_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


@register_reader("csv")
def _read_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("header", "true").csv(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """SQL-database source — the Spark analogue of the reference's five
    dialect connectors (``/root/reference/src/data_quality/connectors/
    factory.py:16-46``; mysql/postgresql/oracle/sqlite/sqlserver each built
    a SQLAlchemy engine).  Spark's JDBC DataSource is the dialect layer:
    the ``url`` scheme picks the dialect, ``driver`` the class.

    Scale note: without ``partition_column`` the whole table is read by ONE
    task; always pass (partition_column, lower_bound, upper_bound,
    num_partitions) for any table that matters so the scan parallelizes
    into range-pruned queries per executor."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # passing None through would send the literal string 'None' as
            # the JDBC bound and fail confusingly inside the datasource
            raise ValueError(
                "read_jdbc: partition_column requires both lower_bound and "
                "upper_bound (got lower_bound="
                f"{lower_bound!r}, upper_bound={upper_bound!r})"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions or 8))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


@register_reader("jdbc")
def _read_jdbc_spec(spark: SparkSession, spec: str) -> DataFrame:
    """Registry entry: ``spec`` is ``<jdbc-url>::<table>`` (the factory
    signature is (spark, str); use :func:`read_jdbc` directly for
    partitioned reads and driver/dialect options)."""
    url, sep, table = spec.rpartition("::")
    if not sep or not url.startswith("jdbc:"):
        raise UnknownFormatError(
            "jdbc spec must be '<jdbc-url>::<table>', got: " + spec
        )
    return read_jdbc(spark, url, table)


@register_reader("iceberg")
def _read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table read — requires an Iceberg catalog in the session
    (jars not shipped in this sandbox; gated, untested here by design)."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as e:  # pragma: no cover
        raise UnknownFormatError(
            "iceberg catalog not available in this runtime"
        ) from e


# -- catalog helpers (reference S3-S6: counts, table info, listing) ---------


def get_table_count(df: DataFrame) -> int:
    """connectors/base.py:59-66 analogue."""
    return df.count()


def get_table_info(df: DataFrame) -> list[dict]:
    """Per-dialect column-info queries (connectors/mysql.py:42-67 etc.)
    collapse to the DataFrame schema."""
    return [
        {
            "name": f.name,
            "type": f.dataType.simpleString(),
            "nullable": f.nullable,
        }
        for f in df.schema.fields
    ]


def list_tables(spark: SparkSession) -> list[str]:
    """information_schema.tables analogue (connectors/mysql.py:93-113)."""
    return [t.name for t in spark.catalog.listTables()]
