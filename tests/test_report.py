"""Golden-file test for the retrieval report artifact (report.py — the
reference generate_plots.py analogue, rendered as markdown)."""

from entity_linking_spark.operators.topk import retrieval_rates
from entity_linking_spark.report import rates_from_row, render_retrieval_report

GOLDEN = """\
# Retrieval rate @ k

| k | retrieval rate | |
|---:|---:|:---|
| 1 | 0.5000 | `####################                    ` |
| 4 | 0.7500 | `##############################          ` |
| 8 | 1.0000 | `########################################` |
"""


def test_render_retrieval_report_golden():
    assert render_retrieval_report({1: 0.5, 4: 0.75, 8: 1.0}) == GOLDEN


def test_report_from_scored_pairs(spark):
    # entity e scores 1.0 - e/10 → candidate rank of entity e is exactly e;
    # each mention's true entity id doubles as its intended true rank
    rows = [
        (m, e, true_id, 1.0 - e / 10.0)
        for m, true_id in [(1, 1), (2, 1), (3, 3), (4, 6)]
        for e in range(1, 9)
    ]
    scored = spark.createDataFrame(
        rows, "mention_id long, entity_id long, true_entity_id long, score double"
    )
    row = retrieval_rates(scored, ks=(1, 4, 8)).first()
    rates = rates_from_row(row)
    assert rates == {1: 0.5, 4: 0.75, 8: 1.0}
    assert render_retrieval_report(rates) == GOLDEN
