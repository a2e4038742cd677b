"""Golden keep/drop + scrubbed-text outputs, checked byte-identical
(SURVEY.md §5(a), FIXTURES.md F0 expected outputs).

The golden file pins the CURRENT rule semantics.  If a future round changes
rules intentionally, regenerate with::

    python - <<'EOF'
    from mysql_data_quality_spark.core.session import get_spark
    from mysql_data_quality_spark.pipeline import pages as P, quality_filter as QF
    import json
    spark = get_spark(cores=8)
    dec = QF.decisions(P.read_pages(spark, "/root/testdata/sf0.001")).orderBy("url").toPandas()
    with open("tests/golden/decisions_sf0001.jsonl", "w") as f:
        for r in dec.itertuples(index=False):
            f.write(json.dumps({"url": r.url, "keep": bool(r.keep),
                                "drop_reason": r.drop_reason,
                                "scrubbed_text": r.scrubbed_text},
                               ensure_ascii=False, sort_keys=True) + "\n")
    EOF
"""

from __future__ import annotations

import json
from pathlib import Path

from mysql_data_quality_spark.pipeline import pages as P
from mysql_data_quality_spark.pipeline import quality_filter as QF
from tests.conftest import SF_SMOKE

GOLDEN = Path(__file__).parent / "golden" / "decisions_sf0001.jsonl"
GOLDEN_FULL = Path(__file__).parent / "golden" / "decisions_full_sf0001.jsonl"


def _check(spark, golden_path, rules=None):
    dec = (
        QF.decisions(P.read_pages(spark, SF_SMOKE), rules=rules)
        .orderBy("url")
        .toPandas()
    )
    golden = [json.loads(line) for line in golden_path.read_text().splitlines()]
    assert len(dec) == len(golden) == 500
    for row, g in zip(dec.itertuples(index=False), golden):
        assert row.url == g["url"]
        assert bool(row.keep) == g["keep"], g["url"]
        assert row.drop_reason == g["drop_reason"], g["url"]
        assert row.scrubbed_text == g["scrubbed_text"], g["url"]
    return dec


def test_decisions_match_golden(spark):
    _check(spark, GOLDEN)


def test_full_profile_decisions_match_golden(spark):
    """The FULL profile (--profile full: every Gopher/C4 rule decides)
    has its own byte-stable golden snapshot — r4 verdict ask #1.  Sanity:
    the full profile must drop strictly more than the default (it adds
    drop-severity rules) and at least one drop_reason must name a rule
    the default profile can't emit."""
    from mysql_data_quality_spark.rules.heuristics import FULL_RULES

    base = _check(spark, GOLDEN)
    full = _check(spark, GOLDEN_FULL, rules=FULL_RULES)
    assert full.keep.sum() < base.keep.sum()
    assert full.drop_reason.str.contains("c4_line_quality").any()
