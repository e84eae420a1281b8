"""Golden-case table: input + rules → expected counts/statuses.

Mirrors the reference's giant parametrization in
tests/integration/core/conftest.py:146-165 (input DF + rules + expected
final/error contents + expected stats fields), compressed to the cases that
exercise distinct semantics.
"""

import pytest

from spark_expectations_spark import (
    DQAggFailError, DQConfig, DQEngine, DQRowFailError, Rule, RuleSet,
)

# (name, rules_kwargs list, expected dict)
CASES = [
    (
        "all_pass",
        [dict(rule_type="row_dq", rule="r1", expectation="col1 >= 1")],
        dict(input=3, errors=0, output=3, row_status="Passed"),
    ),
    (
        "ignore_keeps_rows",
        [dict(rule_type="row_dq", rule="r1", expectation="col1 > 1",
              action_if_failed="ignore")],
        dict(input=3, errors=1, output=3, row_status="Failed"),
    ),
    (
        "drop_removes_rows",
        [dict(rule_type="row_dq", rule="r1", expectation="col1 > 1",
              action_if_failed="drop")],
        dict(input=3, errors=1, output=2, row_status="Failed"),
    ),
    (
        "fail_aborts",
        [dict(rule_type="row_dq", rule="r1", expectation="col1 > 2",
              action_if_failed="fail")],
        dict(raises=DQRowFailError),
    ),
    (
        "multi_rule_union_of_errors",
        [dict(rule_type="row_dq", rule="r1", expectation="col1 > 1",
              action_if_failed="drop"),
         dict(rule_type="row_dq", rule="r2", expectation="col2 != 'c'")],
        # row0 fails r1 (dropped), row2 fails r2 (kept) -> 2 error rows
        dict(input=3, errors=2, output=2, row_status="Failed"),
    ),
    (
        "row_plus_agg_pass",
        [dict(rule_type="row_dq", rule="r1", expectation="col1 >= 1"),
         dict(rule_type="agg_dq", rule="a1", expectation="sum(col3) = 60")],
        dict(input=3, errors=0, output=3, row_status="Passed",
             agg_status="Passed"),
    ),
    (
        "agg_fail_action_aborts_before_row",
        [dict(rule_type="row_dq", rule="r1", expectation="col1 >= 1"),
         dict(rule_type="agg_dq", rule="a1", expectation="sum(col3) > 1000",
              action_if_failed="fail")],
        dict(raises=DQAggFailError),
    ),
    (
        "agg_ignore_continues",
        [dict(rule_type="agg_dq", rule="a1", expectation="sum(col3) > 1000",
              action_if_failed="ignore")],
        dict(input=3, errors=0, output=3, agg_status="Failed"),
    ),
    (
        "target_agg_sees_post_drop_frame",
        [dict(rule_type="row_dq", rule="r1", expectation="col1 > 1",
              action_if_failed="drop"),
         dict(rule_type="agg_dq", rule="a1", expectation="sum(col3) = 50",
              enable_for_source_dq_validation=False,
              enable_for_target_dq_validation=True)],
        dict(input=3, errors=1, output=2, target_agg_status="Passed"),
    ),
    (
        "query_dq_source",
        [dict(rule_type="query_dq", rule="q1",
              expectation="(select max(col1) from gc_view) = 3")],
        dict(input=3, errors=0, output=3, query_status="Passed"),
    ),
    (
        "inactive_rules_skipped",
        [dict(rule_type="row_dq", rule="r1", expectation="col1 > 100",
              is_active=False)],
        dict(input=3, errors=0, output=3, row_status="Skipped"),
    ),
    (
        "window_uniqueness_rule",
        [dict(rule_type="row_dq", rule="u1",
              expectation="count(*) over (partition by col2) = 1")],
        dict(input=3, errors=0, output=3, row_status="Passed"),
    ),
    (
        "query_fail_aborts",
        [dict(rule_type="query_dq", rule="q1",
              expectation="(select count(*) from gc_view) > 100",
              action_if_failed="fail")],
        dict(raises=DQAggFailError),
    ),
    (
        "agg_between_fail_ignored",
        [dict(rule_type="agg_dq", rule="a1",
              expectation="avg(col3) between 100 and 200")],
        dict(input=3, errors=0, output=3, agg_status="Failed"),
    ),
    (
        "target_query_sees_post_drop_view",
        # drop removes col1=1; target query over the post-row-dq view
        [dict(rule_type="row_dq", rule="r1", expectation="col1 > 1",
              action_if_failed="drop"),
         dict(rule_type="query_dq", rule="q1",
              expectation="(select min(col1) from gc_target) = 2",
              enable_for_source_dq_validation=False,
              enable_for_target_dq_validation=True)],
        dict(input=3, errors=1, output=2, target_query_status="Passed"),
    ),
]


@pytest.mark.parametrize("name,rule_kwargs,expected",
                         CASES, ids=[c[0] for c in CASES])
def test_golden(spark, simple3, name, rule_kwargs, expected):
    rules = RuleSet([
        Rule(**{**dict(product_id="p1", table_name="t", column_name="col1"), **kw})
        for kw in rule_kwargs
    ])
    cfg = DQConfig(product_id="p1", table_name="t",
                   write_error_table=False, source_view="gc_view",
                   target_view="gc_target")
    engine = DQEngine(cfg)
    if "raises" in expected:
        with pytest.raises(expected["raises"]):
            engine.run(simple3, rules, spark)
        return
    res = engine.run(simple3, rules, spark)
    assert res.input_count == expected["input"]
    assert res.error_count == expected["errors"]
    assert res.output_count == expected["output"]
    assert res.final_df.count() == expected["output"]
    if "row_status" in expected:
        assert res.status["row_dq"] == expected["row_status"]
    if "agg_status" in expected:
        assert res.status["source_agg_dq"] == expected["agg_status"]
    if "target_agg_status" in expected:
        assert res.status["target_agg_dq"] == expected["target_agg_status"]
    if "query_status" in expected:
        assert res.status["source_query_dq"] == expected["query_status"]
    if "target_query_status" in expected:
        assert res.status["target_query_dq"] == expected["target_query_status"]


def test_null_predicate_counts_as_failure(spark):
    """SQL three-valued logic: a NULL predicate result is NOT a pass —
    the row must land in the error table (reference golden cases treat
    null violations as failures)."""
    df = spark.createDataFrame(
        [(None, "a"), (2, "b"), (3, "c")], "col1 int, col2 string")
    rules = RuleSet([Rule("p1", "t", "row_dq", "r1", "col1", "col1 > 1",
                          action_if_failed="drop")])
    cfg = DQConfig(product_id="p1", table_name="t", write_error_table=False)
    res = DQEngine(cfg).run(df, rules, spark)
    assert res.error_count == 1
    assert res.output_count == 2
    assert res.final_df.filter("col1 is null").count() == 0


def test_params_substitution_in_expectation(spark, simple3):
    rules = RuleSet.from_records(
        [dict(product_id="p1", table_name="t_{env}", rule_type="row_dq",
              rule="r1", column_name="col1",
              expectation="col1 >= {min_col1}")],
        params={"env": "prod", "min_col1": 2},
    )
    assert rules.rules[0].table_name == "t_prod"
    cfg = DQConfig(product_id="p1", table_name="t_prod",
                   write_error_table=False)
    res = DQEngine(cfg).run(simple3, rules, spark)
    assert res.error_count == 1  # col1=1 fails col1 >= 2
