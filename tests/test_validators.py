"""Validator-family semantics tests on tiny fixtures — Triple-A style,
mirroring the reference's unit-test strategy (SURVEY.md §5, FIXTURES.md
F1-F4) with exact expected passed/affected_rows/total_rows values.
"""

from __future__ import annotations

import pytest

from mysql_data_quality_spark.core.types import Rule, Severity
from mysql_data_quality_spark.validators import (
    CompletenessValidator,
    DuplicatesValidator,
    IntegrityValidator,
    PatternsValidator,
)


# ---------------------------------------------------------------------------
# F1 completeness (reference test_completeness.py semantics)
# ---------------------------------------------------------------------------
class TestCompleteness:
    def _df(self, spark):
        rows = [
            (i, i if i < 8 else None, i if i < 6 else None) for i in range(10)
        ]
        return spark.createDataFrame(
            rows, "col_100: bigint, col_80: bigint, col_60: bigint"
        )

    def test_thresholds(self, spark):
        v = CompletenessValidator()
        rule = Rule("c90", "", Severity.WARNING, parameters={"threshold": 0.9})
        res = v.validate_table(self._df(spark), "t", rules=[rule])
        by_col = {r.column_name: r for r in res}
        assert by_col["col_100"].passed and by_col["col_100"].affected_rows == 0
        assert not by_col["col_80"].passed and by_col["col_80"].affected_rows == 2
        assert not by_col["col_60"].passed and by_col["col_60"].affected_rows == 4
        assert by_col["col_60"].total_rows == 10
        assert by_col["col_60"].pass_rate == 60.0
        assert by_col["col_80"].details["completeness_ratio"] == 0.8

    def test_empty_table_passes(self, spark):
        # empty DataFrame => ratio 1.0 => pass (reference
        # test_completeness.py:102-124)
        df = spark.createDataFrame([], "x: string")
        rule = Rule("c100", "", Severity.ERROR, parameters={"threshold": 1.0})
        res = CompletenessValidator().validate_table(df, "t", rules=[rule])
        assert res[0].passed and res[0].pass_rate == 100.0

    def test_bad_threshold_raises(self, spark):
        rule = Rule("bad", "", Severity.ERROR, parameters={"threshold": 1.5})
        with pytest.raises(ValueError, match="threshold"):
            CompletenessValidator().validate_table(
                self._df(spark), "t", rules=[rule]
            )


# ---------------------------------------------------------------------------
# F2 duplicates (reference test_duplicates.py semantics)
# ---------------------------------------------------------------------------
class TestDuplicates:
    def test_per_column_counts(self, spark):
        df = spark.createDataFrame(
            [
                (1, 1, 1, 1, 1),
                (2, 2, 1, 1, None),
                (3, 2, 2, 1, None),
                (4, 3, 2, 1, 2),
                (5, 4, 3, 1, 3),
            ],
            "unique_vals: bigint, one_dup: bigint, two_dups: bigint, "
            "all_same: bigint, with_nulls: bigint",
        )
        v = DuplicatesValidator()
        rule = Rule(
            "d0", "", Severity.WARNING,
            parameters={"max_duplicates": 0, "ignore_nulls": True},
        )
        res = v.validate_table(df, "t", rules=[rule])
        by_col = {r.column_name: r for r in res}
        assert by_col["unique_vals"].affected_rows == 0
        assert by_col["unique_vals"].passed
        assert by_col["one_dup"].affected_rows == 1
        assert by_col["two_dups"].affected_rows == 2
        assert by_col["all_same"].affected_rows == 4
        # ignore_nulls=True: [1,None,None,2,3] -> 0 dups
        assert by_col["with_nulls"].affected_rows == 0

    def test_nulls_as_values(self, spark):
        df = spark.createDataFrame(
            [(1,), (None,), (None,), (2,), (3,)], "with_nulls: bigint"
        )
        rule = Rule(
            "d0", "", Severity.WARNING,
            parameters={"max_duplicates": 0, "ignore_nulls": False},
        )
        res = DuplicatesValidator().validate_table(df, "t", rules=[rule])
        # nulls count as equal values: 5 rows, 4 distinct -> 1 duplicate
        assert res[0].affected_rows == 1
        assert not res[0].passed

    def test_skip_and_force_patterns(self):
        v = DuplicatesValidator()
        assert v.should_skip_column("user_id")
        assert v.should_skip_column("status")
        assert not v.should_skip_column("cpf_number")  # force pattern
        assert not v.should_skip_column("email_address")
        assert not v.should_skip_column("amount")

    def test_composite_key(self, spark):
        df = spark.createDataFrame(
            [(1, "A"), (2, "B"), (3, "C"), (1, "A")], "col1: bigint, col2: string"
        )
        rule = Rule(
            "ck", "", Severity.ERROR,
            parameters={"columns": ["col1", "col2"], "max_duplicates": 0},
        )
        res = DuplicatesValidator().validate_table(df, "t", rules=[rule])
        assert len(res) == 1
        assert res[0].affected_rows == 1  # one duplicate combination
        assert res[0].details["unique_combinations"] == 3
        assert not res[0].passed

    def test_composite_key_null_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "A"), (None, "A"), (1, "A")], "col1: bigint, col2: string"
        )
        rule = Rule(
            "ck", "", Severity.ERROR,
            parameters={"columns": ["col1", "col2"], "max_duplicates": 0,
                        "ignore_nulls": True},
        )
        res = DuplicatesValidator().validate_table(df, "t", rules=[rule])
        assert res[0].details["total_combinations"] == 2
        assert res[0].affected_rows == 1

    def test_bad_max_duplicates_raises(self, spark):
        df = spark.createDataFrame([(1,)], "a: bigint")
        rule = Rule("bad", "", Severity.ERROR, parameters={"max_duplicates": -1})
        with pytest.raises(ValueError, match="max_duplicates"):
            DuplicatesValidator().validate_table(df, "t", rules=[rule])


# ---------------------------------------------------------------------------
# F3 patterns (reference test_patterns.py vectors)
# ---------------------------------------------------------------------------
class TestPatterns:
    def test_cnpj_valid(self, spark):
        df = spark.createDataFrame(
            [("11.444.777/0001-61",), ("11444777000161",), ("11.222.333/0001-81",)],
            "cnpj_column: string",
        )
        rule = Rule("cnpj_validation", "", Severity.ERROR,
                    parameters={"pattern_type": "cnpj"})
        res = PatternsValidator().validate_table(df, "empresas", rules=[rule])
        assert res[0].passed and res[0].affected_rows == 0
        assert res[0].total_rows == 3

    def test_cnpj_invalid(self, spark):
        df = spark.createDataFrame(
            [
                ("11.444.777/0001-61",),  # valid
                ("123456789012345",),     # invalid length
                ("11.444.777/0001-XX",),  # invalid characters
                ("00.000.000/0000-00",),  # invalid check digits (all-same)
                ("",),                    # empty
            ],
            "cnpj_column: string",
        )
        rule = Rule("cnpj_validation", "", Severity.ERROR,
                    parameters={"pattern_type": "cnpj", "allow_nulls": False})
        res = PatternsValidator().validate_table(df, "empresas", rules=[rule])
        assert not res[0].passed
        assert res[0].affected_rows == 4
        assert res[0].total_rows == 5

    def test_cpf_check_digits(self, spark):
        df = spark.createDataFrame(
            [("123.456.789-09",), ("12345678909",), ("987.654.321-00",),
             ("111.111.111-11",), ("123.456.789-10",)],
            "cpf_column: string",
        )
        rule = Rule("cpf_validation", "", Severity.ERROR,
                    parameters={"pattern_type": "cpf"})
        res = PatternsValidator().validate_table(df, "pessoas", rules=[rule])
        # first three valid; all-same-digit and wrong check digit invalid
        assert res[0].affected_rows == 2

    def test_email_and_custom_regex(self, spark):
        df = spark.createDataFrame(
            [("a.user+tag@example.co",), ("no-at-sign",), ("a@b",), (None,)],
            "email_col: string",
        )
        rule = Rule("email_check", "", Severity.WARNING,
                    parameters={"pattern_type": "email", "allow_nulls": True})
        res = PatternsValidator().validate_table(df, "t", rules=[rule])
        assert res[0].affected_rows == 2  # no-at-sign, a@b

        rule2 = Rule("custom", "", Severity.WARNING,
                     parameters={"pattern_type": "regex",
                                 "regex_pattern": "^[A-Z]{3}-\\d{2}$"})
        df2 = spark.createDataFrame([("ABC-12",), ("abc-12",)], "code: string")
        res2 = PatternsValidator().validate_table(df2, "t", rules=[rule2])
        assert res2[0].affected_rows == 1

    def test_auto_detect_no_pattern(self, spark):
        df = spark.createDataFrame([("x",)], "misc: string")
        res = PatternsValidator().validate_table(df, "t")
        assert res[0].passed
        assert res[0].details["pattern_type"] == "none"

    def test_auto_detect_binding(self):
        from mysql_data_quality_spark.validators.patterns import (
            auto_detect_pattern,
        )
        assert auto_detect_pattern("customer_cnpj") == "cnpj"
        assert auto_detect_pattern("CPF") == "cpf"
        assert auto_detect_pattern("user_email") == "email"
        assert auto_detect_pattern("telefone") == "phone_br"
        assert auto_detect_pattern("cep_code") == "cep"
        assert auto_detect_pattern("amount") is None


# ---------------------------------------------------------------------------
# F4 integrity (reference test_integrity.py semantics)
# ---------------------------------------------------------------------------
class TestIntegrity:
    def _setup(self, spark):
        parent = spark.createDataFrame(
            [("client_1",), ("client_2",), ("client_3",)], "uid: string"
        )
        v = IntegrityValidator({"cliente": parent})
        return v

    def test_all_valid(self, spark):
        child = spark.createDataFrame(
            [(1, "client_1"), (2, "client_2")], "id: bigint, cliente_uid: string"
        )
        rule = Rule("fk", "", Severity.ERROR, parameters={
            "foreign_key": "cliente_uid", "reference_table": "cliente",
            "reference_column": "uid"})
        res = self._setup(spark).validate_table(child, "orders", rules=[rule])
        assert res[0].passed
        assert res[0].details["orphaned_records"] == 0

    def test_orphans_counted(self, spark):
        child = spark.createDataFrame(
            [(1, "client_1"), (2, "client_missing"), (3, "client_invalid")],
            "id: bigint, cliente_uid: string",
        )
        rule = Rule("fk", "", Severity.ERROR, parameters={
            "foreign_key": "cliente_uid", "reference_table": "cliente",
            "reference_column": "uid"})
        res = self._setup(spark).validate_table(child, "orders", rules=[rule])
        assert not res[0].passed
        assert res[0].details["orphaned_records"] == 2
        assert res[0].affected_rows == 2
        assert sorted(res[0].details["orphaned_values"]) == [
            "client_invalid", "client_missing"]

    def test_null_fk_modes(self, spark):
        child = spark.createDataFrame(
            [(1, "client_1"), (2, None)], "id: bigint, cliente_uid: string"
        )
        base = {"foreign_key": "cliente_uid", "reference_table": "cliente",
                "reference_column": "uid"}
        v = self._setup(spark)
        ok = v.validate_table(
            child, "orders",
            rules=[Rule("fk", "", Severity.ERROR,
                        parameters={**base, "allow_nulls": True})])
        assert ok[0].passed and ok[0].details["null_count"] == 1
        bad = v.validate_table(
            child, "orders",
            rules=[Rule("fk", "", Severity.ERROR,
                        parameters={**base, "allow_nulls": False})])
        assert not bad[0].passed and bad[0].details["null_violations"] == 1

    def test_composite_fk(self, spark):
        parent = spark.createDataFrame(
            [(1, "A"), (2, "B")], "k1: bigint, k2: string"
        )
        child = spark.createDataFrame(
            [(1, "A", 10), (2, "B", 20), (2, "C", 30)],
            "f1: bigint, f2: string, amount: bigint",
        )
        v = IntegrityValidator({"par": parent})
        rule = Rule("fk", "", Severity.ERROR, parameters={
            "foreign_key": ["f1", "f2"], "reference_table": "par",
            "reference_column": ["k1", "k2"]})
        res = v.validate_table(child, "child", rules=[rule])
        assert res[0].details["orphaned_records"] == 1
        assert res[0].details["orphaned_values"] == [(2, "C")]

    def test_self_reference(self, spark):
        # manager_id references the table's own id column
        emp = spark.createDataFrame(
            [(1, None), (2, 1), (3, 2), (4, 99)],
            "id: bigint, manager_id: bigint",
        )
        v = IntegrityValidator({"emp": emp})
        rule = Rule("fk", "", Severity.ERROR, parameters={
            "foreign_key": "manager_id", "reference_table": "emp",
            "reference_column": "id", "allow_self_reference": True,
            "allow_nulls": True})
        res = v.validate_table(emp, "emp", rules=[rule])
        assert res[0].details["orphaned_records"] == 1  # manager 99

    def test_missing_params_raise(self, spark):
        child = spark.createDataFrame([(1,)], "a: bigint")
        v = IntegrityValidator({})
        with pytest.raises(ValueError, match="foreign_key"):
            v._validate_fk(child, "t", Rule("x", "", Severity.ERROR,
                                            parameters={}))


# ---------------------------------------------------------------------------
# engine orchestration (reference base.py:156-212)
# ---------------------------------------------------------------------------
class TestEngine:
    def test_engine_runs_and_isolates_errors(self, spark):
        from mysql_data_quality_spark.core.engine import ValidationEngine

        class Boom:
            name = "boom"

            def validate_table(self, df, table_name):
                raise RuntimeError("kaboom")

        eng = ValidationEngine()
        eng.register_validator(CompletenessValidator())
        eng.register_validator(Boom())
        df = spark.createDataFrame([(1,)], "a: bigint")
        res = eng.validate_data(df, "t")
        names = {r.rule_name for r in res}
        assert "default_completeness" in names
        boom = [r for r in res if r.rule_name == "boom_error"][0]
        assert not boom.passed and boom.severity == Severity.CRITICAL

    def test_validator_selection(self, spark):
        from mysql_data_quality_spark.core.engine import ValidationEngine

        eng = ValidationEngine()
        eng.register_validator(CompletenessValidator())
        eng.register_validator(DuplicatesValidator())
        df = spark.createDataFrame([(1,)], "amount: bigint")
        res = eng.validate_data(df, "t", validator_names=["completeness"])
        assert all("completeness" in r.rule_name for r in res)
