"""Every documented rule-expectation pattern from the reference's rules
catalog (docs/configurations/rules.md) evaluated through this engine.

Each case instantiates a documented pattern against the lineitem fixture
and asserts the expected number of failing rows (row_dq) or the
pass/fail status (agg_dq / query_dq) — evidence that the full documented
rule surface runs on this engine's fused evaluation paths.
"""

import pytest

from spark_expectations_spark import DQConfig, DQEngine, Rule, RuleSet
from spark_expectations_spark.operators import query_dq

from conftest import SF_DIR

# (name, expectation, expect_failures_bool)
ROW_PATTERNS = [
    ("null_validation", "l_shipdate is not null", False),
    ("date_format_validation",
     "to_date(cast(l_shipdate as string), 'yyyy-MM-dd HH:mm:ss') is not null",
     False),
    ("regex_match", "l_returnflag rlike '^[ANR]$'", False),
    ("regex_not_match", "l_returnflag not rlike '^[0-9]+$'", False),
    ("date_parseable", "try_cast(cast(l_shipdate as string) as date) is not null",
     False),
    ("in_set", "l_linestatus in ('O','F')", False),
    ("not_in_set", "l_linestatus not in ('X','Y')", False),
    ("in_range", "l_quantity between 1 and 50", False),
    ("length_between", "length(l_returnflag) between 1 and 1", False),
    ("length_equal", "length(l_linestatus) = 1", False),
    ("greater_than", "l_extendedprice > 0", False),
    ("lesser_than", "l_discount < 1", False),
    ("pair_A_greater_B", "l_extendedprice >= l_discount", False),
    ("multicolumn_sum",
     "l_quantity + l_discount + l_tax > 0", False),
    ("sum_in_subset",
     "sum(l_quantity) over(partition by l_returnflag order by 1) > 0", False),
    ("count_in_subset",
     "count(*) over(partition by l_returnflag order by 1) > 1", False),
    # a deliberately failing one so the harness itself is validated
    ("failing_range", "l_quantity between 100 and 200", True),
]

AGG_PATTERNS = [
    ("distinct_in_set",
     "size(array_intersect(collect_set(l_returnflag), array('A','N','R'))) = 3",
     "pass"),
    ("mean_between", "avg(l_discount) between 0 and 0.2", "pass"),
    ("median_between",
     "percentile_approx(l_quantity, 0.5) between 1 and 50", "pass"),
    ("stdev_between", "stddev(l_quantity) between 0 and 50", "pass"),
    ("unique_count_between",
     "count(distinct l_returnflag) between 1 and 3", "pass"),
    ("max_between", "max(l_quantity) between 1 and 50", "pass"),
    ("min_between", "min(l_quantity) between 1 and 50", "pass"),
    ("row_count_between", "count(*) between 1 and 100000000", "pass"),
    ("row_count_range", "count(*) > 0 and count(*) < 100000000", "pass"),
    ("failing_agg", "avg(l_quantity) > 1000", "fail"),
]


@pytest.fixture(scope="module")
def li(spark):
    # unpersist at module teardown: a lingering cached relation replaces
    # LATER parquet scans of the same file with InMemoryRelation, which
    # silently defeats the pushdown/pruning plan pins in other modules
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()
    yield df
    df.unpersist()


class TestDocumentedRowPatterns:
    @pytest.mark.parametrize("name,expectation,expect_failures",
                             ROW_PATTERNS, ids=[p[0] for p in ROW_PATTERNS])
    def test_pattern(self, spark, li, name, expectation, expect_failures):
        rules = RuleSet([Rule("p", "t", "row_dq", name, "", expectation)])
        cfg = DQConfig(product_id="p", table_name="t", write_error_table=False)
        res = DQEngine(cfg).run(li, rules, spark)
        if expect_failures:
            assert res.error_count > 0
        else:
            assert res.error_count == 0, f"{name} unexpectedly failed rows"


class TestDocumentedUniquenessPatterns:
    def test_primary_key_validation_catches_seeded_dupes(self, spark, li):
        """The driver's synthetic lineitem deliberately seeds duplicate
        (l_orderkey, l_linenumber) keys; the documented uniqueness rule
        must flag exactly the rows living in duplicated groups —
        verified against an independent groupBy formulation."""
        from pyspark.sql import functions as F
        expected = (
            li.groupBy("l_orderkey", "l_linenumber")
            .agg(F.count(F.lit(1)).alias("c")).filter("c > 1")
            .agg(F.sum("c")).first()[0] or 0
        )
        assert expected > 0, "fixture no longer seeds duplicate pks"
        rules = RuleSet([Rule(
            "p", "t", "row_dq", "pk_unique", "",
            "count(*) over(partition by l_orderkey, l_linenumber order by 1) = 1")])
        cfg = DQConfig(product_id="p", table_name="t", write_error_table=False)
        res = DQEngine(cfg).run(li, rules, spark)
        assert res.error_count == expected

    def test_complete_duplicate_validation_all_columns(self, spark, li):
        """row_number over ALL columns (the documented full-duplicate
        dedup): the fixture has no full-row duplicates, so zero rows
        fail; errors = rows minus distinct rows as an invariant."""
        cols = ", ".join(li.columns)
        distinct = li.distinct().count()
        rules = RuleSet([Rule(
            "p", "t", "row_dq", "full_dup", "",
            f"row_number() over(partition by {cols} order by 1) = 1")])
        cfg = DQConfig(product_id="p", table_name="t", write_error_table=False)
        res = DQEngine(cfg).run(li, rules, spark)
        assert res.error_count == res.input_count - distinct


class TestDocumentedAggPatterns:
    def test_all_in_one_run(self, spark, li):
        rules = RuleSet([Rule("p", "t", "agg_dq", n, "", e)
                         for n, e, _ in AGG_PATTERNS])
        cfg = DQConfig(product_id="p", table_name="t", write_error_table=False)
        res = DQEngine(cfg).run(li, rules, spark)
        got = {r.rule.rule: r.status for r in res.source_agg}
        assert got == {n: s for n, e, s in AGG_PATTERNS}


class TestDocumentedQueryPatterns:
    def test_query_patterns(self, spark, li):
        od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        query_dq.register_views(spark, {"lineitem": li, "orders": od})
        rules = RuleSet([
            Rule("p", "t", "query_dq", "distinct_gt_threshold", "",
                 "(select count(distinct l_returnflag) from lineitem) > 1"),
            Rule("p", "t", "query_dq", "count_match_between_tables", "",
                 "(select count(distinct l_orderkey) from lineitem) <= "
                 "(select count(*) from orders)"),
        ])
        cfg = DQConfig(product_id="p", table_name="t", write_error_table=False)
        res = DQEngine(cfg).run(li, rules, spark)
        assert all(r.status == "pass" for r in res.source_query)


class TestRulesDocExamples:
    """Every ```text example in RULES.md must be a parseable expectation
    of its section's rule type — the doc can't drift from the engine."""

    def _blocks(self):
        import re
        from pathlib import Path
        md = Path(__file__).resolve().parents[1] / "RULES.md"
        section = None
        out = []
        in_block = False
        for line in md.read_text().splitlines():
            if line.startswith("## "):
                m = re.match(r"## (row_dq|agg_dq|query_dq)", line)
                section = m.group(1) if m else None
            elif line.strip() == "```text":
                in_block = True
            elif line.strip() == "```":
                in_block = False
            elif in_block and section and line.strip():
                part = line.split("--")[0].strip()
                if not part:
                    continue
                if out and out[-1][0] == section and \
                        out[-1][1].count("(") > out[-1][1].count(")"):
                    out[-1] = (section, out[-1][1] + " " + part)
                else:
                    out.append((section, part))
        return [(t, e) for t, e in out if "@" not in e and "{" not in e]

    def test_examples_validate(self, spark):
        from spark_expectations_spark import validation
        blocks = self._blocks()
        assert len(blocks) >= 12  # the doc actually has examples
        bad = []
        for rule_type, expr in blocks:
            issues = validation.validate_rule(
                spark, Rule("p", "t", rule_type, "doc_ex", "c", expr))
            errors = [i for i in issues if i.severity == "error"]
            if errors:
                bad.append((rule_type, expr, errors[0].message))
        assert not bad, bad


class TestRound5SurfaceFixes:
    """Regressions for the plans/functions/sources/compat review pass."""

    def test_in_set_matches_escape_quotes(self, spark):
        from spark_expectations_spark import functions as fn
        e = fn.in_set("name", ["O'Brien", "X"])
        df = spark.createDataFrame([("O'Brien",), ("Y",)], "name string")
        from pyspark.sql import functions as F
        assert df.filter(F.expr(e)).count() == 1
        e2 = fn.matches("s", "it's")
        df2 = spark.createDataFrame([("it's",), ("its",)], "s string")
        assert df2.filter(F.expr(e2)).count() == 1

    def test_from_df_substitutes_placeholder_table_names(self, spark):
        """Rules stored with '{env}_db.t' table names must be found when
        filtering by the SUBSTITUTED name (they were filtered out before
        substitution ever ran)."""
        from spark_expectations_spark import RuleSet
        rows = [("p", "{env}_db.sales", "row_dq", "r1", "c", "c > 0",
                 "ignore", True),
                ("p", "other_db.t", "row_dq", "r2", "c", "c > 0",
                 "ignore", True)]
        df = spark.createDataFrame(
            rows, "product_id string, table_name string, rule_type string, "
                  "rule string, column_name string, expectation string, "
                  "action_if_failed string, is_active boolean")
        rs = RuleSet.from_df(df, product_id="p",
                             table_name="prod_db.sales",
                             params={"env": "prod"})
        assert [r.rule for r in rs.rules] == ["r1"]
        assert rs.rules[0].table_name == "prod_db.sales"
        # and without params the exact-match path is unchanged
        rs2 = RuleSet.from_df(df, product_id="p", table_name="other_db.t")
        assert [r.rule for r in rs2.rules] == ["r2"]

    def test_row_rule_with_scalar_subquery_aggregate_validates(self, spark):
        from spark_expectations_spark import Rule
        from spark_expectations_spark.validation import validate_rule
        r = Rule("p", "t", "row_dq", "cap", "amount",
                 "amount <= (select max(cap) from limits_view)")
        issues = validate_rule(spark, r)
        assert not [i for i in issues if i.severity == "error"], issues

    def test_agg_inside_string_literal_not_aggregate(self):
        from spark_expectations_spark.core.rules import looks_aggregate
        assert not looks_aggregate("col rlike 'sum(.*'")
        assert looks_aggregate("sum(x) > 0")

    def test_ambiguous_case_env_blocks_raise(self, tmp_path):
        from spark_expectations_spark.core.rules import DQRuleError
        from spark_expectations_spark.sources.loaders import load_rules
        p = tmp_path / "r.yaml"
        p.write_text(
            "product_id: p\n"
            "rules:\n"
            "  - {table_name: t, rule_type: row_dq, rule: r1,"
            " column_name: c, expectation: c > 0}\n"
            "dq_env:\n"
            "  Prod: {is_active: true}\n"
            "  prod: {is_active: false}\n")
        with pytest.raises(DQRuleError, match="ambiguous"):
            load_rules(str(p), env="prod")

    def test_read_schema_columns_decimal_and_nested(self, spark, tmp_path):
        from spark_expectations_spark import plans
        p = str(tmp_path / "dec")
        spark.sql(
            "select cast(1.5 as decimal(12,2)) as price, "
            "cast(2 as decimal(10,0)) as qty, "
            "named_struct('x', 1, 'y', 2) as nested, 3 as plain"
        ).write.parquet(p)
        df = spark.read.parquet(p).select("price", "qty", "nested", "plain")
        df.write.format("noop").mode("overwrite").save()
        cols = plans.read_schema_columns(df)
        assert set(cols) == {"price", "qty", "nested", "plain"}

    def test_num_exchanges_counts_round_robin(self, spark):
        from spark_expectations_spark import plans
        df = spark.range(100).repartition(8)
        assert plans.num_shuffles(df) == 0       # by design: key shuffles only
        assert plans.num_exchanges(df) == 1      # strict counter sees it

    def test_compat_string_user_conf_values(self, spark):
        """user_conf from JSON/--conf arrives string-typed: 'false' must
        disable, and a string threshold must not crash on_completion."""
        from spark_expectations_spark.compat import SparkExpectations
        rows = [("p", "t", "row_dq", "r1", "col1", "col1 > 0",
                 "ignore", True)]
        rules_df = spark.createDataFrame(
            rows, "product_id string, table_name string, rule_type string, "
                  "rule string, column_name string, expectation string, "
                  "action_if_failed string, is_active boolean")
        import shutil
        spark.sql("DROP TABLE IF EXISTS se_stats_compat_t")
        shutil.rmtree("spark-warehouse/se_stats_compat_t",
                      ignore_errors=True)
        se = SparkExpectations(product_id="p", rules_df=rules_df,
                               stats_table="se_stats_compat_t")
        conf = {
            "spark.expectations.notifications.on.start": "false",
            "spark.expectations.notifications.on.completion": "false",
            "spark.expectations.notifications.on.fail": "false",
            "spark.expectations.notifications.error.drop.threshold": "5",
            "se.enable.error.table": "false",
        }

        @se.with_expectations("t", user_conf=conf, write_to_table=False)
        def produce():
            return spark.createDataFrame([(1,), (2,)], "col1 int")

        try:
            out = produce()
            assert out.count() == 2
        finally:
            spark.sql("DROP TABLE IF EXISTS se_stats_compat_t")
