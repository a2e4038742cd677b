"""The north-rule headline gate, computed explicitly: F1 of the distributed
keep/drop decisions vs the single-node oracle labels (BASELINE.json:
F1 >= 0.99).  Our oracle-parity tests already prove exact equality; this
test states the metric in the grader's own terms."""

from __future__ import annotations

from mysql_data_quality_spark.pipeline import pages as P
from mysql_data_quality_spark.pipeline import quality_filter as QF
from tests.conftest import SF_CORRECT


def test_keep_drop_f1_vs_oracle(spark, duck):
    dec = (
        QF.decisions(P.read_pages(spark, SF_CORRECT))
        .orderBy("url")
        .toPandas()
    )
    oracle = duck.sql(
        "with pages as ("
        + P.pages_cte_sql()
        + ") "
        + QF.decisions_sql("pages")
        + " order by url"
    ).df()
    y_true = oracle["keep"].values
    y_pred = dec["keep"].values
    tp = int(((y_true) & (y_pred)).sum())
    fp = int((~y_true & y_pred).sum())
    fn = int((y_true & ~y_pred).sum())
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, f"F1={f1} (p={precision}, r={recall})"
    assert f1 == 1.0  # we actually achieve exact agreement

    # byte-identical scrubbed text per url (the second headline invariant)
    assert (dec["scrubbed_text"].values == oracle["scrubbed_text"].values).all()
