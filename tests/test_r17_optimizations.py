"""Focused tests for the r17 optimization round.

First block: the four r16-advice robustness fixes (local_frame array
payload cap, chi2_pvalue int-dof Column path, non-finite PQ codeword
literals, posting_list_pairs hot-twin salt). Later blocks pin the
equivalence of this round's rewrites — the optimization contract is
BIT-identical results (the driver re-oracles every catalog entry), so
asserts are exact equality, not tolerances.
"""

import math

import pytest
from pyspark.sql import functions as F

from spark_expectations_spark.operators import dedup, drift, similarity
from spark_expectations_spark.plans import local_frame, plan_text


class TestLocalFrameArrayCap:
    def test_array_payload_counts_toward_cap(self, spark):
        # 64 rows x 2 cols passes the old rows*cols cap, but each cell's
        # dim-64 vector is 64 literal nodes -> must route to
        # createDataFrame (no literal relation in the plan)
        rows = [(i, [float(i)] * 64) for i in range(64)]
        df = local_frame(spark, rows, "cid int, vec array<double>")
        txt = plan_text(df)
        assert "Scan ExistingRDD" in txt or "LocalTableScan" in txt
        got = df.orderBy("cid").collect()
        assert len(got) == 64 and got[3]["vec"] == [3.0] * 64

    def test_small_scalar_frame_still_literal(self, spark):
        rows = [(i, float(i) / 2) for i in range(10)]
        df = local_frame(spark, rows, "k int, v double")
        # the literal-relation path plans no Python RDD scan
        assert "Scan ExistingRDD" not in plan_text(df)
        assert df.count() == 10

    def test_small_array_frame_under_cap_stays_literal(self, spark):
        rows = [(i, [float(i), 1.0]) for i in range(8)]  # 8*(1+2)=24
        df = local_frame(spark, rows, "k int, v array<double>")
        assert "Scan ExistingRDD" not in plan_text(df)
        assert df.orderBy("k").collect()[2]["v"] == [2.0, 1.0]


class TestChi2PvalueIntDof:
    def test_column_chi2_with_int_dof(self, spark):
        # Column chi2 + int dof used to fall into the Column loop with a
        # plain-int d, raising TypeError from F.when(bool, ...)
        df = spark.createDataFrame([(2.0,), (10.0,)], "x double")
        got = [r["p"] for r in
               df.select(drift.chi2_pvalue(F.col("x") * 1.0, 8)
                         .alias("p")).collect()]
        # survival of chi2 at dof 8: exp(-x/2) * sum_{j<4} (x/2)^j / j!
        for x, p in zip([2.0, 10.0], got):
            h = x / 2.0
            want = math.exp(-h) * sum(h ** j / math.factorial(j)
                                      for j in range(4))
            assert p == pytest.approx(want, abs=1e-9)

    def test_matches_sql_fast_path(self, spark):
        df = spark.createDataFrame([(3.5, 4), (7.0, 6)], "x double, d int")
        fast = [r["p"] for r in
                df.select(drift.chi2_pvalue("x", "d").alias("p")).collect()]
        slow = [r["p"] for r in
                df.select(drift.chi2_pvalue(F.col("x"), F.col("d"))
                          .alias("p")).collect()]
        assert fast == slow


class TestNonFiniteCodewords:
    def test_product_quantize_nan_codeword_plans_and_runs(self, spark):
        books = [[[float("nan"), 1.0], [0.0, 0.0]],
                 [[float("inf"), 0.0], [2.0, float("-inf")]]]
        df = spark.createDataFrame([(1, [0.5, 0.5, 1.0, 1.0])],
                                   "id int, embedding array<double>")
        out = similarity.product_quantize(df, codebooks=books).collect()
        # nan distances lose argmin to the finite codeword; codes exist
        assert out[0]["pq_codes"] is not None
        assert len(out[0]["pq_codes"]) == 2
        assert out[0]["pq_codes"][0] == 1  # nan book: codeword 1 wins

    def test_pq_query_lut_nan_entries(self, spark):
        books = [[[float("nan")], [1.0]]]
        df = spark.createDataFrame([([2.0],)], "q array<double>")
        got = df.select(similarity.pq_query_lut("q", books)
                        .alias("lut")).collect()[0]["lut"]
        assert math.isnan(got[0]) and got[1] == 1.0

    def test_dbl_sql_spellings(self):
        assert similarity._dbl_sql(1.5) == "1.5D"
        assert similarity._dbl_sql(float("nan")) == "CAST('NaN' AS DOUBLE)"
        assert similarity._dbl_sql(float("inf")) == \
            "CAST('Infinity' AS DOUBLE)"
        assert similarity._dbl_sql(float("-inf")) == \
            "CAST('-Infinity' AS DOUBLE)"


class TestWeightedCosineCarriedVerify:
    """r17: weighted_cosine_join's verify moved from a (rid, tok)
    re-join + pair groupBy to a map-side intersect over carried
    string-encoded (tok, w2) arrays. Pins the encoding's edge cases."""

    def _run(self, spark, lrows, rrows, wrows, threshold=0.5):
        from spark_expectations_spark.operators import linkage
        L = spark.createDataFrame(lrows, "lid int, sa array<string>")
        R = spark.createDataFrame(rrows, "rid int, sb array<string>")
        W = spark.createDataFrame(wrows, "token string, weight double")
        return linkage.weighted_cosine_join(
            L, R, "lid", "sa", "rid", "sb", W, threshold=threshold)

    def test_matches_reference_dot(self, spark):
        # weights with non-trivial double reprs (parse-back must be
        # exact) and a token CONTAINING the \x01 separator
        sep_tok = "a\x01b"
        wrows = [("x", 0.1), ("y", 3.7), (sep_tok, 2.5), ("z", 1.0)]
        lrows = [(1, ["x", "y", sep_tok]), (2, ["z"])]
        rrows = [(10, ["x", "y", sep_tok, "z"]), (11, ["y"])]
        got = {(r["lid"], r["rid"]): (r["n_common"], r["dot"], r["cosine"])
               for r in self._run(spark, lrows, rrows, wrows).collect()}
        import math
        w = dict(wrows)

        def ref(la, ra):
            common = set(la) & set(ra) & set(w)
            dot = sum(w[t] ** 2 for t in sorted(common))
            na = sum(w[t] ** 2 for t in la if t in w)
            nb = sum(w[t] ** 2 for t in ra if t in w)
            return common, dot, na, nb

        for (lid, la) in lrows:
            for (rid, ra) in rrows:
                common, dot, na, nb = ref(la, ra)
                expect = dot * dot >= 0.25 * na * nb and common
                if expect:
                    assert (lid, rid) in got, (lid, rid)
                    n, d, c = got[(lid, rid)]
                    assert n == len(common)
                    assert d == pytest.approx(dot, rel=1e-12)
                    assert c == pytest.approx(
                        dot / math.sqrt(na * nb), rel=1e-12)
                else:
                    assert (lid, rid) not in got

    def test_pair_per_match_no_duplicates(self, spark):
        # a pair meeting on several prefix tokens must emit ONE row
        wrows = [("a", 5.0), ("b", 5.0), ("c", 5.0)]
        lrows = [(1, ["a", "b", "c"])]
        rrows = [(9, ["a", "b", "c"])]
        out = self._run(spark, lrows, rrows, wrows, threshold=0.9).collect()
        assert len(out) == 1 and out[0]["n_common"] == 3
        assert out[0]["cosine"] == pytest.approx(1.0)


class TestSetSimilarityLargeSetsGate:
    """r17: set_similarity_join's large_sets flag swaps the prefix
    WINDOW for the groupBy-carried-array shape — must be
    output-identical (same ranks, same carried arrays, same verify)."""

    def _pairs(self, spark, large, hash_tokens=False):
        from spark_expectations_spark.operators import linkage
        rows_l = [(i, [f"t{j}" for j in range(i, i + 8)])
                  for i in range(30)]
        rows_r = [(100 + i, [f"t{j}" for j in range(i + 2, i + 10)])
                  for i in range(30)]
        L = spark.createDataFrame(rows_l, "lid int, sa array<string>")
        R = spark.createDataFrame(rows_r, "rid int, sb array<string>")
        out = linkage.set_similarity_join(
            L, R, "lid", "sa", "rid", "sb", threshold=0.5,
            hash_tokens=hash_tokens, large_sets=large)
        return sorted(tuple(r) for r in out.collect())

    def test_gate_output_identical(self, spark):
        a = self._pairs(spark, large=False)
        b = self._pairs(spark, large=True)
        assert a == b and len(a) > 10

    def test_gate_output_identical_hashed(self, spark):
        a = self._pairs(spark, large=False, hash_tokens=True)
        b = self._pairs(spark, large=True, hash_tokens=True)
        assert a == b and len(a) > 10


class TestPostingListPairsSalt:
    def test_identical_hot_lists_unchanged_pairs(self, spark):
        # several rows carrying the SAME ids array (the LSH multi-band
        # collision shape) must still expand to the same multiset of
        # pairs after the salted repartition
        ids = list(range(12))
        df = spark.createDataFrame([(b, ids) for b in range(5)],
                                   "band int, ids array<int>")
        got = sorted(tuple(r) for r in dedup.posting_list_pairs(
            df, salt_cols=["band"]).collect())
        one = sorted((a, b) for i, a in enumerate(ids)
                     for b in ids[i + 1:])
        assert got == sorted(one * 5)
