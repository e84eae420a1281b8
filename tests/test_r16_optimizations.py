"""Focused equivalence tests for the r16 optimization rewrites.

Each test pins a rewritten internal against its pre-r16 formulation on
randomized inputs — the optimization contract is BIT-identical results
(the driver re-oracles every catalog entry), so these assert exact
equality, not tolerances.
"""

import random

import pytest
from pyspark.sql import functions as F

from spark_expectations_spark.operators import dedup, graph, similarity


def _old_pair_expr():
    """The pre-r16 nested-HOF pair expansion, kept here as the
    equivalence reference for posting_list_pairs."""
    return F.explode(F.flatten(F.transform(
        F.col("ids"),
        lambda a, i: F.transform(
            F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
        ),
    )))


class TestPostingListPairs:
    def test_matches_nested_hof_on_random_lists(self, spark):
        rng = random.Random(7)
        rows = [(i, sorted(rng.sample(range(500), rng.randint(2, 30))))
                for i in range(80)]
        df = spark.createDataFrame(rows, "k int, ids array<int>")
        old = sorted(
            tuple(r) for r in
            df.select(_old_pair_expr().alias("p")).select("p.*").collect())
        new = sorted(tuple(r) for r in dedup.posting_list_pairs(df).collect())
        assert new == old and len(new) > 100

    def test_singleton_and_empty_lists_emit_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, [5]), (2, []), (3, [7, 9])], "k int, ids array<int>")
        got = sorted(tuple(r)
                     for r in dedup.posting_list_pairs(df).collect())
        assert got == [(7, 9)]

    def test_string_ids_preserved(self, spark):
        df = spark.createDataFrame([(1, ["a", "b", "c"])],
                                   "k int, ids array<string>")
        got = sorted(tuple(r)
                     for r in dedup.posting_list_pairs(df).collect())
        assert got == [("a", "b"), ("a", "c"), ("b", "c")]


class TestSymmetrizeEdges:
    def test_matches_union_form(self, spark):
        rng = random.Random(3)
        rows = [(rng.randint(0, 50), rng.randint(51, 99), rng.randint(1, 9))
                for _ in range(200)]
        pairs = spark.createDataFrame(rows, "pa long, pb long, w long")
        union_form = (
            pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"),
                         "w")
            .unionByName(pairs.select(F.col("pb").alias("src"),
                                      F.col("pa").alias("dst"), "w")))
        old = sorted(tuple(r) for r in union_form.collect())
        new = sorted(tuple(r) for r in
                     graph.symmetrize_edges(pairs, "pa", "pb",
                                            carry=("w",)).collect())
        assert new == old and len(new) == 400

    def test_no_carry_columns(self, spark):
        pairs = spark.createDataFrame([(1, 2)], "pa long, pb long")
        got = sorted(tuple(r) for r in
                     graph.symmetrize_edges(pairs, "pa", "pb").collect())
        assert got == [(1, 2), (2, 1)]


class TestTransformedMoments:
    def test_bit_identical_to_unfused_chain(self, spark):
        import numpy as np

        rng = random.Random(11)
        dim = 6
        rows = [(i, [rng.uniform(-2, 2) for _ in range(dim)])
                for i in range(300)] + [(999, None)]
        df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
        _, mu, cov = similarity._corpus_moments(df, "emb")
        lam, u = np.linalg.eigh(cov)
        w = (u * (1.0 / np.sqrt(np.maximum(lam, 0.0) + 1e-6))) @ u.T
        # unfused pre-r16 chain
        whitened = similarity._apply_whitening(df, mu, w, "emb", "__w")
        n_old, mean_old, cov_old = similarity._corpus_moments(whitened, "__w")
        # fused r16 pass
        n_new, mean_new, cov_new = similarity._transformed_moments(
            df, "emb", mu, w)
        assert n_new == n_old == 300
        assert np.array_equal(mean_new, mean_old)
        assert np.array_equal(cov_new, cov_old)

    def test_ragged_vectors_fail_loudly(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
            "vec_id long, emb array<double>")
        import numpy as np
        with pytest.raises(Exception, match="ragged"):
            similarity._transformed_moments(
                df, "emb", np.zeros(2), np.eye(2))


class TestSingleMaterialization:
    """r16 batch 2: multi-consumer subtrees that had NO persist are
    now lazily persisted (semdedup's assignment pass, ccnet's scored
    frame via quantile_buckets(persist_input=True)) — without one the
    subtree is planted once per consumer and computed that many times
    (measured: two ~5 task-s assignment jobs per warm embed_semdedup
    run). A LAZY persist computes it exactly once (accumulator-proven
    in OPTIMIZATION_r16.md — the eager-populate variant was tried and
    reverted as pure overhead)."""

    def test_term_weights_reads_cache_and_values_stable(self, spark):
        from spark_expectations_spark import plans
        from spark_expectations_spark.operators import text

        df = spark.createDataFrame(
            [(i, f"tok{i % 5} tok{i % 3} shared") for i in range(60)],
            "doc_id long, text string")
        out = text.term_weights(df, "doc_id", "text", min_df=2)
        # every consumer subtree reads the materialized (doc, term, tf)
        # cache, never the tokenize+explode pipeline
        assert "InMemoryTableScan" in plans.plan_text(out, "simple")
        rows = {(r.doc_id, r.term): (r.tf, round(r.weight, 9))
                for r in out.collect()}
        # hand-check one cell: doc 0 has terms tok0, tok0, shared ->
        # tf(tok0)=2; every doc carries "shared" (df=60)
        assert rows[(0, "tok0")][0] == 2
        assert all((d, "shared") in rows for d in range(60))
        spark.catalog.clearCache()

    def test_term_weights_unknown_scheme_raises_before_persist(self, spark):
        from spark_expectations_spark.operators import text

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        base = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        with pytest.raises(ValueError, match="unknown scheme"):
            text.term_weights(df, "doc_id", "text", scheme="nope")
        # validation fires before the plan is built — the late branch
        # raise left a marked-but-never-computed persist behind
        assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() \
            == base

    def test_quantile_buckets_persist_input_parity(self, spark):
        from spark_expectations_spark.operators import sampling

        rng = random.Random(5)
        df = spark.createDataFrame(
            [(i, "ab"[i % 2], rng.randint(-100, 100)) for i in range(300)],
            "id long, g string, score long")
        plain = sampling.quantile_buckets(df, "g", "score")
        cached = sampling.quantile_buckets(df, "g", "score",
                                           persist_input=True)
        assert sorted(map(tuple, plain.collect())) == \
            sorted(map(tuple, cached.collect()))
        spark.catalog.clearCache()

    def test_semdedup_reads_assignment_cache(self, spark):
        from spark_expectations_spark import plans
        from spark_expectations_spark.operators import similarity

        rng = random.Random(9)
        rows = [(i, i % 4, [rng.uniform(-1, 1) for _ in range(8)])
                for i in range(120)]
        # plant exact duplicates so the removal side is non-empty
        rows += [(1000 + i, i % 4, rows[i][2]) for i in range(10)]
        df = spark.createDataFrame(
            rows, "vec_id long, label long, embedding array<double>")
        cents = similarity.train_centroids_df(
            df, vec_col="embedding", by_col="label")
        kept = similarity.semdedup(
            df, id_col="vec_id", vec_col="embedding",
            threshold=0.999999, centroids=cents)
        txt = plans.plan_text(kept, "simple")
        # both consumers (pair search + anti-join keep side) read the
        # single materialized assignment pass
        assert "InMemoryTableScan" in txt
        kept_ids = {r.vec_id for r in kept.collect()}
        # exact duplicates: the higher id of each planted pair is gone
        assert all(1000 + i not in kept_ids for i in range(10))
        assert all(i in kept_ids for i in range(10))
        spark.catalog.clearCache()



class TestAlphaCiFusedAction:
    """krippendorff_alpha(ci=True) r16 rework: the point estimate and
    the weighted-D_o aggregate ride the replica-marginals collect as
    broadcast crossJoins — one driver action instead of three. The
    value contract (point == plain run, deterministic replicas) is
    covered by TestKrippendorffAlpha; these pin the rework's edges."""

    def test_empty_input_keeps_the_replica_error(self, spark):
        import pytest as _pytest
        from spark_expectations_spark.operators import profiling
        empty = spark.createDataFrame([], "unit long, label string")
        with _pytest.raises(ValueError, match="non-degenerate"):
            profiling.krippendorff_alpha(empty, "unit", "label",
                                         ci=True, replicas=8)

    def test_all_null_labels_keep_the_replica_error(self, spark):
        import pytest as _pytest
        from spark_expectations_spark.operators import profiling
        df = spark.createDataFrame(
            [(1, None), (1, None), (2, None)], "unit long, label string")
        with _pytest.raises(ValueError, match="non-degenerate"):
            profiling.krippendorff_alpha(df, "unit", "label",
                                         ci=True, replicas=8)

    def test_point_columns_survive_the_crossjoin_for_all_metrics(
            self, spark):
        from spark_expectations_spark.operators import profiling
        df = spark.createDataFrame(
            [(u, r, float(v)) for u in range(1, 13)
             for r, v in enumerate([u % 3 + 1, u % 3 + 1, (u % 4) + 1])],
            "unit long, rater int, rating double")
        for m in ("nominal", "interval", "ordinal"):
            got = profiling.krippendorff_alpha(
                df, "unit", "rating", metric=m, ci=True,
                replicas=8).first()
            plain = profiling.krippendorff_alpha(
                df, "unit", "rating", metric=m).first()
            assert got["alpha"] == plain["alpha"], m
            assert got["d_o"] == plain["d_o"], m
            assert got["d_e"] == plain["d_e"], m
            assert got["n_units"] == plain["n_units"], m
            assert got["n_ratings"] == plain["n_ratings"], m


class TestNgramOverlapSinglePass:
    """The r16 ngram_overlap rework (one tagged map-explode + conditional
    per-side counts, token-arithmetic sizes) against the pre-r16 shape
    (3x-planted gram-build base, per-side counts, (id, gram) inner
    join). The contract is bit-identical rows."""

    @staticmethod
    def _old_ngram_overlap(df, id_col, ref_col, cand_col, *, n=2):
        from spark_expectations_spark.operators.text import _word_ngrams

        def words(c):
            return F.filter(
                F.split(F.trim(F.lower(F.coalesce(F.col(c), F.lit("")))),
                        r"\s+"),
                lambda t: t != "")

        base = df.select(
            F.col(id_col).alias("__id"),
            _word_ngrams(words(ref_col), n).alias("__rg"),
            _word_ngrams(words(cand_col), n).alias("__cg"))
        sizes = base.select("__id", F.size("__rg").alias("__nr"),
                            F.size("__cg").alias("__nc"))
        rg = (base.select("__id", F.explode("__rg").alias("__g"))
              .groupBy("__id", "__g")
              .agg(F.count(F.lit(1)).alias("__cr")))
        cg = (base.select("__id", F.explode("__cg").alias("__g"))
              .groupBy("__id", "__g")
              .agg(F.count(F.lit(1)).alias("__cc")))
        match = (rg.join(cg, ["__id", "__g"])
                 .groupBy("__id")
                 .agg(F.sum(F.least("__cr", "__cc")).alias("__m")))
        m = F.coalesce(F.col("__m"), F.lit(0)).cast("double")
        nr, nc = F.col("__nr"), F.col("__nc")
        return (sizes.join(match, "__id", "left")
                .select(
                    F.col("__id").alias(id_col),
                    nr.alias("n_ref_ngrams"),
                    nc.alias("n_cand_ngrams"),
                    F.coalesce(F.col("__m"), F.lit(0)).alias("n_match"),
                    F.when(nc > 0, m / nc).alias("precision"),
                    F.when(nr > 0, m / nr).alias("recall"),
                    F.when(nr + nc > 0,
                           F.lit(2.0) * m / (nr + nc)).alias("f1")))

    def _fixture(self, spark, seed=11, rows=120):
        import random as _random
        rng = _random.Random(seed)
        vocab = ["a", "b", "cat", "dog", "the", "zz", "b"]
        data = []
        for i in range(rows):
            ref = " ".join(rng.choices(vocab, k=rng.randint(0, 12)))
            cand = " ".join(rng.choices(vocab, k=rng.randint(0, 12)))
            if i % 17 == 0:
                ref = None
            if i % 23 == 0:
                cand = ""
            data.append((i, ref, cand))
        return spark.createDataFrame(data,
                                     "id long, ref string, cand string")

    def test_matches_old_shape_bit_identical(self, spark):
        from spark_expectations_spark.operators import text as T
        df = self._fixture(spark)
        for n in (1, 2, 3):
            new = T.ngram_overlap(df, "id", "ref", "cand", n=n)
            old = self._old_ngram_overlap(df, "id", "ref", "cand", n=n)
            assert new.schema == old.schema, n
            new_rows = sorted(map(tuple, new.collect()))
            old_rows = sorted(map(tuple, old.collect()))
            assert new_rows == old_rows, n
            assert any(r[3] > 0 for r in new_rows)   # matches happen
            assert any(r[1] == 0 for r in new_rows)  # empty sides happen

    def test_no_join_feeds_the_match_count(self, spark):
        """The match aggregate must come from conditional sums over ONE
        gram stream, not an (id, gram) self-join."""
        from spark_expectations_spark.operators import text as T
        df = self._fixture(spark, seed=5, rows=10)
        plan = T.ngram_overlap(df, "id", "ref", "cand")._jdf \
            .queryExecution().optimizedPlan().toString()
        assert plan.lower().count("join") <= 1  # only the sizes left-join


class TestWordShingles3ArraysZip:
    """r16: queries._word_shingles3 moved from a double-zip_with walk
    (two interpreted HOF passes per row) to arrays_zip + ONE transform
    — the dedup.shingles_col shape, measured 2.3x faster per corpus
    pass. The equivalence reference is the old expression verbatim."""

    @staticmethod
    def _old(warr):
        m = F.greatest(F.size(warr) - 2, F.lit(1))
        s1, s2, s3 = (F.slice(warr, i, m) for i in (1, 2, 3))
        return F.zip_with(
            F.zip_with(s1, s2, lambda a, b: F.concat_ws(" ", a, b)),
            s3, lambda ab, c: F.concat_ws(" ", ab, c))

    def test_exact_array_equality_incl_edges(self, spark):
        from spark_expectations_spark.queries import _word_shingles3
        rows = [(0, None), (1, ""), (2, "a"), (3, "a b"), (4, "a b c"),
                (5, "a b c d"), (6, "a a a a"), (7, "  x   y  z  "),
                (8, "one two three four five six seven eight")]
        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(40)]
        rows += [(100 + i, " ".join(rng.choices(vocab,
                                                k=rng.randint(0, 30))))
                 for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        both = df.select(
            "doc_id",
            self._old(words).alias("o"), _word_shingles3(words).alias("n"))
        # exact per-row array equality, compared driver-side: a
        # DataFrame-level ~eqNullSafe filter would be PUSHED below the
        # fixture's own size guard and evaluate the guarded slice on
        # short rows (a test artifact, not a query shape)
        for r in both.collect():
            assert r["o"] == r["n"], r
        # and on the sliced twin-words form the linkage queries use
        tw = F.slice(words, 1, F.size(words) - 5)
        both_tw = (df.filter(F.size(words) >= 8)
                   .select("doc_id", self._old(tw).alias("o"),
                           _word_shingles3(tw).alias("n")))
        n_tw = 0
        for r in both_tw.collect():
            assert r["o"] == r["n"], r
            n_tw += 1
        assert n_tw > 50  # the twin branch actually exercised


class TestLocalFrame:
    """r16: plans.local_frame — driver-rows spec tables as literal
    relations (no Python-RDD scan stage) with the measured size cap."""

    def test_matches_createdataframe(self, spark):
        from pyspark.sql.types import (DoubleType, LongType, StringType,
                                       StructField, StructType)
        from spark_expectations_spark.plans import local_frame
        schema = StructType([StructField("s", StringType()),
                             StructField("n", LongType()),
                             StructField("x", DoubleType())])
        rows = [("a", 1, 0.5), (None, 2, float("nan")), ("c", None, None)]
        lit_df = local_frame(spark, rows, schema)
        ref_df = spark.createDataFrame(rows, schema)
        assert lit_df.schema == ref_df.schema
        got = sorted(map(tuple, lit_df.collect()),
                     key=lambda t: (t[0] is None, str(t)))
        want = sorted(map(tuple, ref_df.collect()),
                      key=lambda t: (t[0] is None, str(t)))
        assert repr(got) == repr(want)  # repr: NaN == NaN comparison

    def test_no_python_scan_under_cap(self, spark):
        from spark_expectations_spark.plans import local_frame
        df = local_frame(spark, [("a", 1)], "k string, v long")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" not in plan and "Scan" not in plan.replace(
            "LocalTableScan", "").replace("RowDataSourceScan", "SCAN_OK")

    def test_falls_back_above_cap(self, spark):
        from spark_expectations_spark import plans
        rows = [(str(i), i) for i in range(200)]  # 400 literals > cap
        df = plans.local_frame(spark, rows, "k string, v long")
        assert df.count() == 200
        assert sorted(map(tuple, df.collect()))[:2] == [("0", 0), ("1", 1)]

    def test_empty_rows_keep_schema(self, spark):
        from spark_expectations_spark.plans import local_frame
        df = local_frame(spark, [], "k string, v long")
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["k", "v"]


class TestDenseGlobalIndexSqlBucket:
    """r16: dense_global_index builds its threshold-indicator sum and
    offset map as ONE SQL string each (the per-threshold Column loop
    cost ~6 py4j round trips per threshold — seconds of driver chatter
    at the default 256 buckets). Pin the ids against the semantics on
    float, int, and NULL-carrying keys."""

    def _ids(self, spark, rows, schema, key_cols, nb):
        from spark_expectations_spark.operators.sampling import (
            dense_global_index)
        df = spark.createDataFrame(rows, schema)
        out = dense_global_index(df, key_cols, num_buckets=nb)
        got = {tuple(r[k] for k in key_cols): r["global_id"]
               for r in out.collect()}
        ordered = sorted(got, key=lambda t: tuple(
            (v is not None, v) for v in t))
        assert [got[k] for k in ordered] == list(range(len(ordered)))

    def test_float_keys(self, spark):
        rng = random.Random(3)
        rows = [(rng.random() * 100, i) for i in range(500)]
        self._ids(spark, rows, "score double, id long",
                  ["score", "id"], 16)

    def test_int_keys_with_ties_and_nulls(self, spark):
        rng = random.Random(4)
        rows = [(rng.randint(0, 40), i) for i in range(300)]
        rows += [(None, 9000 + i) for i in range(5)]
        self._ids(spark, rows, "score int, id long", ["score", "id"], 8)

    def test_constant_key_single_bucket(self, spark):
        rows = [(7, i) for i in range(50)]
        self._ids(spark, rows, "score int, id long", ["score", "id"], 4)


class TestChi2PvalueSqlCase:
    """r16: chi2_pvalue builds its even-dof CASE chain as one SQL
    string for string/int column refs (the Column-op loop cost ~1.5k
    py4j round trips at max_dof=40). Pin bit-equality against the
    Column-loop reference across the dof range and the edges."""

    @staticmethod
    def _ref(chi2_col, dof_col, *, max_dof=40, digits=9):
        import math
        x = F.col(chi2_col) if isinstance(chi2_col, str) else chi2_col
        d = F.col(dof_col) if isinstance(dof_col, str) else dof_col
        half = x / F.lit(2.0)
        expr = F.lit(None).cast("double")
        for dof in range(2, max_dof + 1, 2):
            s = F.lit(0.0)
            for jj in range(dof // 2):
                s = s + F.pow(half, F.lit(float(jj))) \
                    / F.lit(float(math.factorial(jj)))
            expr = F.when(d == dof, F.exp(-half) * s).otherwise(expr)
        return F.round(expr, digits) + F.lit(0.0)

    def test_bit_equal_to_column_loop(self, spark):
        from spark_expectations_spark.operators.drift import chi2_pvalue
        rng = random.Random(11)
        rows = [(rng.random() * 80.0,
                 rng.choice([1, 2, 3, 4, 6, 8, 20, 38, 40, 41, 42, 0]))
                for _ in range(1500)] + [(0.0, 2), (None, 4), (5.0, None)]
        df = spark.createDataFrame(rows, "chi2 double, dof int")
        both = df.select(self._ref("chi2", "dof").alias("o"),
                         chi2_pvalue("chi2", "dof").alias("n"),
                         self._ref("chi2", F.lit(8)).alias("o8"),
                         chi2_pvalue("chi2", 8).alias("n8"))
        assert both.filter(~F.col("o").eqNullSafe(F.col("n"))).count() == 0
        assert both.filter(~F.col("o8").eqNullSafe(F.col("n8"))).count() == 0


class TestMinhashSignaturesSqlAggs:
    """r16: minhash_signatures builds its K seeded-hash aggregates as
    SQL strings (the Column loop cost ~12 py4j round trips per hash).
    Pin signature equality against the Column-loop reference for both
    hash families."""

    def test_bit_equal_both_families(self, spark):
        from spark_expectations_spark.operators import dedup as D
        rows = [(i, f"doc {i % 7} text {' '.join(str(j) for j in range(i % 9))}")
                for i in range(60)] + [(100, None), (101, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")

        def ref(df, fam, k=8):
            first = F.xxhash64("shingle") if fam == "xxhash64" \
                else D.hash48_md5(F.col("shingle"))
            ex = D.explode_shingles(df, "doc_id", "text", 3).select(
                "doc_id", first.alias("sh"))
            aggs = [F.min(D._seeded_hash(F.col("sh"), i, fam)).alias(f"h{i}")
                    for i in range(k)]
            return ex.groupBy("doc_id").agg(*aggs)

        for fam in ("xxhash64", "md5_48"):
            o = sorted(map(tuple, ref(df, fam).collect()))
            n = sorted(map(tuple, D.minhash_signatures(
                df, "doc_id", "text", n=3, num_hashes=8,
                hash_family=fam).collect()))
            assert o == n, fam
