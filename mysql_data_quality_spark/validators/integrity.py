"""Integrity validator — referential (FK) checks as broadcast anti-joins.

Semantics match the reference
(``/root/reference/src/data_quality/validators/integrity.py:120-262``):
  * orphaned record = non-null FK value absent from the reference keys;
  * nulls counted separately; they violate only when ``allow_nulls=False``
    (integrity.py:195-202 — a composite key is "null" if ANY part is null);
  * composite keys supported (integrity.py:180-188);
  * self-referencing tables union the child's own keys into the reference
    set first (integrity.py:174-178);
  * ``integrity_ratio = valid/total`` (1.0 on empty), up to 10 orphan samples.

Spark design: the reference builds a Python set on the driver and probes it
row-by-row (integrity.py:183-204) — a hand-rolled broadcast hash anti-join.
Here it IS a broadcast hash anti-join: ``child.join(broadcast(parent_keys.
distinct()), on=key, how="left_anti")`` (SURVEY.md J1-J4).  Parent key sets
of dimension tables are small; ``broadcast()`` keeps the probe shuffle-free
at any child scale.  For huge parents, drop the hint and AQE picks SMJ.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_data_quality_spark.core.types import Rule, RuleResult, Severity


def rules_from_metadata(fk_specs: Sequence[dict]) -> List[Rule]:
    """Auto-generate FK rules from declarative metadata — the Spark-side
    analogue of the reference's ``information_schema.KEY_COLUMN_USAGE``
    auto-discovery (``integrity.py:306-362``, ``connectors/mysql.py:69-91``).

    Each spec mirrors one KEY_COLUMN_USAGE row::

        {"column_name": "o_custkey", "referenced_table_name": "customer",
         "referenced_column_name": "c_custkey",
         "constraint_name": "fk_orders_customer"}     # optional extras:
        {"allow_nulls": False, "severity": Severity.ERROR}

    There is no live information_schema in a lakehouse; the spec list comes
    from wherever the catalog keeps FK facts (Iceberg table properties, a
    dbt manifest, a metadata service) — the rule construction is identical.
    """
    rules: List[Rule] = []
    for spec in fk_specs:
        col = spec["column_name"]
        ref_table = spec["referenced_table_name"]
        ref_col = spec["referenced_column_name"]
        constraint = spec.get(
            "constraint_name", f"fk_{col}_{ref_table}_{ref_col}"
        )
        rules.append(
            Rule(
                name=f"auto_fk_{constraint}",
                description=(
                    f"Auto-discovered foreign key: {col} -> "
                    f"{ref_table}.{ref_col}"
                ),
                severity=spec.get("severity", Severity.ERROR),
                parameters={
                    "foreign_key": col,
                    "reference_table": ref_table,
                    "reference_column": ref_col,
                    "allow_nulls": spec.get("allow_nulls", True),
                },
                family="integrity",
            )
        )
    return rules


def discover_fk_rules_jdbc(
    spark, url: str, table: str, driver: Optional[str] = None
) -> List[Rule]:
    """LIVE foreign-key auto-discovery from a SQL database — the full
    analogue of the reference's ``information_schema.KEY_COLUMN_USAGE``
    query (``integrity.py:306-362``), but via JDBC's standard
    ``DatabaseMetaData.getImportedKeys`` so it is dialect-neutral (MySQL,
    Postgres, Derby, ... — anything with a JDBC driver) instead of one
    information_schema query per dialect.

    Returns the same auto rules as :func:`rules_from_metadata`; pair with
    :func:`sources.registry.read_jdbc` to load the child/parent tables.
    Tested against an embedded Derby database with a real FK constraint.
    """
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        rs = conn.getMetaData().getImportedKeys(None, None, table)
        specs = []
        while rs.next():
            specs.append(
                {
                    "column_name": rs.getString("FKCOLUMN_NAME"),
                    "referenced_table_name": rs.getString("PKTABLE_NAME"),
                    "referenced_column_name": rs.getString("PKCOLUMN_NAME"),
                    "constraint_name": rs.getString("FK_NAME"),
                }
            )
        rs.close()
    finally:
        conn.close()
    return rules_from_metadata(specs)


class IntegrityValidator:
    name = "integrity"
    description = "Validates referential integrity (foreign keys)"

    def __init__(
        self,
        reference_frames: Optional[dict[str, DataFrame]] = None,
        broadcast_parent: bool = True,
    ) -> None:
        """``reference_frames``: table name -> DataFrame resolver (the Spark
        analogue of the reference's live DB connector, integrity.py:289-304).
        """
        self._rules: List[Rule] = []
        self.reference_frames = reference_frames or {}
        self.broadcast_parent = broadcast_parent

    def add_rule(self, rule: Rule) -> None:
        self._rules.append(rule)

    def get_rules(self) -> List[Rule]:
        return list(self._rules)

    def register_reference(self, table_name: str, df: DataFrame) -> None:
        self.reference_frames[table_name] = df

    def validate_table(
        self,
        df: DataFrame,
        table_name: str,
        rules: Optional[List[Rule]] = None,
    ) -> List[RuleResult]:
        rules = rules if rules is not None else self.get_rules()
        return [
            self._validate_fk(df, table_name, r) for r in rules if r.enabled
        ]

    # ------------------------------------------------------------------
    def _validate_fk(
        self, df: DataFrame, table_name: str, rule: Rule
    ) -> RuleResult:
        p = rule.parameters
        foreign_key = p.get("foreign_key")
        reference_table = p.get("reference_table")
        reference_column = p.get("reference_column")
        allow_nulls = p.get("allow_nulls", True)
        allow_self_reference = p.get("allow_self_reference", False)
        if not foreign_key:
            raise ValueError("foreign_key parameter is required")
        if not reference_table:
            raise ValueError("reference_table parameter is required")
        if not reference_column:
            raise ValueError("reference_column parameter is required")

        fk: Sequence[str] = (
            [foreign_key] if isinstance(foreign_key, str) else list(foreign_key)
        )
        ref: Sequence[str] = (
            [reference_column]
            if isinstance(reference_column, str)
            else list(reference_column)
        )
        if len(fk) != len(ref):
            raise ValueError(
                "foreign_key and reference_column must have same length"
            )
        missing = [c for c in fk if c not in df.columns]
        if missing:
            raise ValueError(f"Foreign key columns not found in data: {missing}")

        ref_df = self.reference_frames.get(reference_table)
        if ref_df is None:
            raise ValueError(f"Reference table '{reference_table}' not registered")
        missing_ref = [c for c in ref if c not in ref_df.columns]
        if missing_ref:
            raise ValueError(
                f"Reference columns not found in reference data: {missing_ref}"
            )

        # parent key set (SELECT DISTINCT cols — reference integrity.py:294-303)
        parent = ref_df.select(
            *[F.col(r).alias(f) for r, f in zip(ref, fk)]
        )
        if allow_self_reference and reference_table == table_name:
            # union the child's own key values (reference integrity.py:174-178)
            parent = parent.union(
                df.select(*[F.col(r).alias(f) for r, f in zip(ref, fk)])
            )
        parent = parent.distinct()
        if self.broadcast_parent:
            parent = F.broadcast(parent)

        any_null = F.lit(False)
        for c in fk:
            any_null = any_null | F.col(c).isNull()

        child = df.select(*fk)
        # one agg pass for totals + null split
        row = child.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(any_null.cast("long")).alias("nulls"),
        ).collect()[0]
        total = int(row["total"])
        null_count = int(row["nulls"] or 0)

        # broadcast hash LEFT ANTI join on the non-null remainder = orphans
        orphans_df = child.where(~any_null).join(parent, on=list(fk), how="left_anti")
        orphaned_count = orphans_df.count()

        null_violations = null_count if not allow_nulls else 0
        invalid = orphaned_count + null_violations
        valid = total - invalid
        passed = invalid == 0

        orphan_samples: list = []
        if orphaned_count > 0:
            rows = orphans_df.limit(10).collect()
            orphan_samples = [
                r[fk[0]] if len(fk) == 1 else tuple(r[c] for c in fk)
                for r in rows
            ]

        if passed:
            if null_count > 0 and allow_nulls:
                message = (
                    f"All {total - null_count} non-null foreign key references "
                    f"are valid ({null_count} nulls allowed)"
                )
            else:
                message = f"All {total} foreign key references are valid"
        else:
            issues = []
            if orphaned_count > 0:
                issues.append(f"{orphaned_count} orphaned records")
            if null_violations > 0:
                issues.append(f"{null_violations} null values")
            message = f"Foreign key validation failed: {', '.join(issues)}"

        return RuleResult(
            rule_name=rule.name,
            table_name=table_name,
            column_name=None,
            severity=rule.severity,
            passed=bool(passed),
            message=message,
            details={
                "foreign_key_columns": list(fk),
                "reference_table": reference_table,
                "reference_columns": list(ref),
                "total_references": total,
                "valid_references": valid,
                "invalid_references": invalid,
                "orphaned_records": int(orphaned_count),
                "null_violations": int(null_violations),
                "null_count": null_count,
                "allow_nulls": allow_nulls,
                "orphaned_values": orphan_samples,
                "integrity_ratio": float(valid / total) if total > 0 else 1.0,
            },
            affected_rows=invalid,
            total_rows=total,
        )
