"""Parameterized-rule surface (the reference's ValidationRule semantics):
custom thresholds, disabled rules, custom severities flow through both the
Spark plan and the generated oracle SQL."""

from __future__ import annotations

from mysql_data_quality_spark.core.types import Severity
from mysql_data_quality_spark.pipeline import pages as P
from mysql_data_quality_spark.pipeline import quality_filter as QF
from mysql_data_quality_spark.rules.heuristics import DEFAULT_RULES, HRule
from tests.conftest import SF_SMOKE


def _custom_rules() -> tuple[HRule, ...]:
    out = []
    for r in DEFAULT_RULES:
        if r.name == "min_words":
            out.append(HRule("min_words", r.severity, "n_words", "<", 50))
        elif r.name == "lang_undetected":
            # demote to annotation-only
            out.append(
                HRule(r.name, Severity.WARNING, r.feature, r.op, r.value)
            )
        elif r.name == "repetition":
            out.append(HRule(r.name, r.severity, r.feature, r.op, r.value,
                             enabled=False))
        else:
            out.append(r)
    return tuple(out)


class TestRuleConfig:
    def test_custom_rules_change_decisions(self, spark):
        pages = P.read_pages(spark, SF_SMOKE)
        default = QF.decisions(pages).orderBy("url").toPandas()
        custom = QF.decisions(pages, rules=_custom_rules()).orderBy(
            "url"
        ).toPandas()
        # stricter min_words drops more; lang demotion drops fewer of those
        assert (custom["keep"] != default["keep"]).any()
        assert "lang_undetected" not in ",".join(custom["drop_reason"])
        assert "repetition" not in ",".join(custom["drop_reason"])
        assert any("min_words" in r for r in custom["drop_reason"])

    def test_custom_rules_oracle_parity(self, spark, duck):
        rules = _custom_rules()
        pages = P.read_pages(spark, "/root/testdata/sf0.01")
        dec = QF.decisions(pages, rules=rules).orderBy("url").toPandas()
        oracle = duck.sql(
            "with pages as ("
            + P.pages_cte_sql()
            + ") "
            + QF.decisions_sql("pages", rules=rules)
            + " order by url"
        ).df()
        for c in dec.columns:
            assert (dec[c].values == oracle[c].values).all(), c

    def test_disabled_rule_absent_from_hits(self, spark):
        pages = P.read_pages(spark, SF_SMOKE)
        ann = QF.annotate(pages, rules=_custom_rules())
        assert "hit_repetition" not in ann.columns
        assert "hit_min_words" in ann.columns


def test_profile_registry():
    """Named profiles: 'full' enables every heuristic; unknown names
    raise (typo safety, same contract as DQS_RULE_ overrides)."""
    import pytest

    from mysql_data_quality_spark.rules.heuristics import (
        DEFAULT_RULES,
        FULL_RULES,
        profile_rules,
    )

    assert profile_rules("default") is DEFAULT_RULES
    assert profile_rules("full") is FULL_RULES
    assert all(r.enabled for r in FULL_RULES)
    assert [r.name for r in FULL_RULES] == [r.name for r in DEFAULT_RULES]
    assert any(not r.enabled for r in DEFAULT_RULES)  # default stays masked
    with pytest.raises(ValueError, match="unknown rule profile"):
        profile_rules("fulll")
