"""rules_presets generators, run END-TO-END through the engine — the
presets must produce rules the fused projection / single-agg /
scalar-subquery machinery executes, not just strings that look right."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_expectations_spark import (  # noqa: E402
    DQConfig, DQEngine, RuleSet, rules_presets as P,
)


class TestPresetGenerators:
    def test_not_null_and_range_flag_expected_rows(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, None), (3, 999)], "id int, v int")
        rules = RuleSet([
            *P.not_null_rules("p", "t", ["v"], action_if_failed="drop"),
            P.range_rule("p", "t", "v", lo=0, hi=100),
        ])
        res = DQEngine(DQConfig(product_id="p", table_name="t",
                                write_error_table=False)).run(
            df, rules, spark)
        assert res.output_count == 2        # NULL row dropped
        counts = res.row_summary.rule_failed_counts
        assert counts["v_not_null"] == 1
        assert counts["v_range"] == 2       # NULL and 999 both violate

    def test_accepted_values_quoting_and_null(self, spark):
        df = spark.createDataFrame(
            [(1, "O"), (2, "x'y"), (3, None)], "id int, s string")
        r = P.accepted_values_rule("p", "t", "s", ["O", "x'y"])
        rules = RuleSet([r])
        res = DQEngine(DQConfig(product_id="p", table_name="t",
                                write_error_table=False)).run(
            df, rules, spark)
        # the escaped literal matched; only the NULL row violates
        assert res.row_summary.rule_failed_counts[r.rule] == 1
        r2 = P.accepted_values_rule("p", "t", "s", ["O", "x'y"],
                                    allow_null=True)
        rules2 = RuleSet([r2])
        res2 = DQEngine(DQConfig(product_id="p", table_name="t",
                                 write_error_table=False)).run(
            df, rules2, spark)
        assert res2.row_summary.rule_failed_counts[r2.rule] == 0
        with pytest.raises(ValueError):
            P.accepted_values_rule("p", "t", "s", [])
        with pytest.raises(ValueError, match="allow_null"):
            P.accepted_values_rule("p", "t", "s", ["A", None])

    def test_unique_key_flags_every_copy(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "b")], "k int, g string")
        r = P.unique_key_rule("p", "t", ["k", "g"])
        res = DQEngine(DQConfig(product_id="p", table_name="t",
                                write_error_table=False)).run(
            df, RuleSet([r]), spark)
        assert res.row_summary.rule_failed_counts[r.rule] == 2

    def test_referential_rule_end_to_end(self, spark):
        child = spark.createDataFrame(
            [(1, 10), (2, 99), (3, None)], "id int, fk int")
        parent = spark.createDataFrame([(10,), (20,)], "pk int")
        r = P.referential_rule("p", "orders", "fk", "parents_v", "pk",
                               child_view="child_v",
                               action_if_failed="fail")
        cfg = DQConfig(product_id="p", table_name="orders",
                       source_view="child_v",
                       views={"parents_v": parent},
                       write_error_table=False)
        from spark_expectations_spark.operators.agg_dq import DQAggFailError
        with pytest.raises(DQAggFailError, match="fk_refs_parents_v"):
            DQEngine(cfg).run(child, RuleSet([r]), spark)  # fk=99 orphan
        # NULL fk is exempt: remove the orphan and the rule passes
        ok = child.filter("fk is null or fk = 10")
        res = DQEngine(cfg).run(ok, RuleSet([r]), spark)
        assert res.source_query[0].status == "pass"

    def test_freshness_and_row_count(self, spark):
        from datetime import datetime, timedelta
        now = datetime.now()
        df = spark.createDataFrame(
            [(1, now - timedelta(hours=2))], "id int, ts timestamp")
        fresh = P.freshness_rule("p", "t", "ts", max_age_hours=4)
        stale = P.freshness_rule("p", "t", "ts", max_age_hours=1,
                         name="ts_stale")
        vol = P.row_count_rule("p", "t", min_rows=1, max_rows=10)
        res = DQEngine(DQConfig(product_id="p", table_name="t",
                                write_error_table=False)).run(
            df, RuleSet([fresh, stale, vol]), spark)
        by = {r.rule.rule: r.status for r in res.source_agg}
        assert by[fresh.rule] == "pass"
        assert by[stale.rule] == "fail"
        assert by[vol.rule] == "pass"
        with pytest.raises(ValueError):
            P.freshness_rule("p", "t", "ts")

    def test_freshness_day_and_fractional_hours_run(self, spark):
        """Review fix: float hours rendered 'INTERVAL 168.0 HOURS',
        which Spark rejects — days and fractional hours must execute."""
        from datetime import datetime, timedelta
        df = spark.createDataFrame(
            [(1, datetime.now() - timedelta(hours=2))],
            "id int, ts timestamp")
        rules = RuleSet([
            P.freshness_rule("p", "t", "ts", max_age_days=7),
            P.freshness_rule("p", "t", "ts", max_age_hours=1.5,
                             name="ts_90min"),
        ])
        res = DQEngine(DQConfig(product_id="p", table_name="t",
                                write_error_table=False)).run(
            df, rules, spark)
        by = {r.rule.rule: r.status for r in res.source_agg}
        assert by["ts_freshness"] == "pass"     # 2h old < 7d
        assert by["ts_90min"] == "fail"         # 2h old > 1.5h

    def test_row_count_name_override(self, spark):
        rules = RuleSet([
            P.row_count_rule("p", "t", min_rows=1),
            P.row_count_rule("p", "t", min_rows=100, name="volume_floor"),
        ])
        assert len(rules.rules) == 2

    def test_quoted_identifiers_survive(self, spark):
        df = spark.createDataFrame([(1,), (None,)], ["weird col"])
        rules = RuleSet(P.not_null_rules("p", "t", ["weird col"]))
        res = DQEngine(DQConfig(product_id="p", table_name="t",
                                write_error_table=False)).run(
            df, rules, spark)
        assert res.row_summary.rule_failed_counts["weird col_not_null"] == 1

    def test_matches_and_castable(self, spark):
        df = spark.createDataFrame(
            [(1, "AB-12", "3"), (2, "nope", "x"), (3, None, "7")],
            "id int, code string, num string")
        rules = RuleSet([
            P.matches_rule("p", "t", "code", r"^[A-Z]{2}-\d+$"),
            P.castable_rule("p", "t", "num", "int"),
        ])
        res = DQEngine(DQConfig(product_id="p", table_name="t",
                                write_error_table=False)).run(
            df, rules, spark)
        counts = res.row_summary.rule_failed_counts
        assert counts["code_matches"] == 2    # 'nope' and NULL
        assert counts["num_castable"] == 1    # 'x'
        with pytest.raises(ValueError, match="suspicious"):
            P.castable_rule("p", "t", "num", "int) IS NULL --")
