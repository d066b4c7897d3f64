"""Round-8 operator tests: triangle census, k-core peel, soft-dedup
weights, KS drift view."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pydin_spark.operators import curation, dedup
from pydin_spark.operators.graph import (kcore, kcore_oracle_sql,
                                         triangles,
                                         triangles_oracle_sql)


def _edges(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _values_cte(edges):
    return ("edges(src, dst) AS (VALUES "
            + ", ".join(f"({a}, {b})" for a, b in edges) + ")")


# ---- triangles ----

def test_triangles_known_graph(spark):
    # two triangles sharing edge (2,3) plus a pendant at node 1:
    # {1,2,3} and {2,3,4}
    edges = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (5, 1)]
    out = {r["node"]: (r["deg"], r["tri_cnt"], r["lcc"])
           for r in triangles(_edges(spark, edges)).collect()}
    assert out[1] == (3, 1, pytest.approx(1 / 3))
    assert out[2] == (3, 2, pytest.approx(2 / 3))
    assert out[3] == (3, 2, pytest.approx(2 / 3))
    assert out[4] == (2, 1, 1.0)
    assert out[5] == (1, 0, 0.0)


def test_triangles_canonicalization(spark):
    # reversed duplicates and self-loops change nothing: the census
    # runs on the canonical simple graph
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(2, 1), (3, 1), (1, 1), (2, 2), (1, 2)]
    a = sorted(tuple(r) for r in triangles(_edges(spark, base)).collect())
    b = sorted(tuple(r) for r in triangles(_edges(spark, noisy)).collect())
    assert a == b
    assert all(r[2] == 1 for r in a)  # every node in the one triangle


def test_triangles_matches_oracle(spark):
    # quadratic-residue digraph + a planted clique: hits the
    # tie-breaking path of the degree ordering (equal degrees)
    edges = ([(i, (i * i) % 11) for i in range(2, 11)]
             + [(1, 2), (2, 3), (1, 3), (20, 21)])
    out = sorted(
        (r["node"], r["deg"], r["tri_cnt"], round(r["lcc"], 9))
        for r in triangles(_edges(spark, edges)).collect())
    sql = triangles_oracle_sql(_values_cte(edges))
    oracle = sorted((n, d, t, round(l, 9)) for n, d, t, l in
                    duckdb.connect().execute(sql).fetchall())
    assert out == oracle


def test_triangles_empty_and_triangle_free(spark):
    assert triangles(_edges(spark, [])).count() == 0
    star = [(0, i) for i in range(1, 6)]  # no triangle through a star
    out = triangles(_edges(spark, star)).collect()
    assert all(r["tri_cnt"] == 0 for r in out)
    hub = {r["node"]: r for r in out}[0]
    assert hub["deg"] == 5 and hub["lcc"] == 0.0


# ---- k-core ----

def test_kcore_clique_with_tail(spark):
    # 4-clique {1..4} + tail 4-5-6: the 3-core is exactly the clique,
    # and every survivor keeps degree 3 inside it
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6)]
    out = {r["node"]: r["core_deg"]
           for r in kcore(_edges(spark, edges), k=3, rounds=5).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_rounds_monotone_to_empty(spark):
    # a path unravels one node per round from each end under k=2;
    # more rounds only ever shrink the survivor set, and the true
    # 2-core of a path is empty
    edges = [(i, i + 1) for i in range(1, 8)]
    r1 = {r["node"] for r in
          kcore(_edges(spark, edges), k=2, rounds=1).collect()}
    r3 = {r["node"] for r in
          kcore(_edges(spark, edges), k=2, rounds=3).collect()}
    assert r3 <= r1 and len(r3) < len(r1)
    assert kcore(_edges(spark, edges), k=2, rounds=10).count() == 0


def test_kcore_k1_is_stable(spark):
    # after canonicalization every node has degree >= 1, so k=1 peels
    # nothing regardless of rounds
    edges = [(1, 2), (3, 4), (4, 5)]
    out = kcore(_edges(spark, edges), k=1, rounds=4)
    assert out.count() == 5


def test_kcore_matches_oracle(spark):
    edges = ([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
              (4, 5), (5, 6), (6, 7), (7, 5)]
             + [(i, i + 1) for i in range(10, 16)])
    out = sorted(tuple(r) for r in
                 kcore(_edges(spark, edges), k=2, rounds=6).collect())
    sql = kcore_oracle_sql(_values_cte(edges), k=2, rounds=6)
    oracle = sorted(tuple(r) for r in
                    duckdb.connect().execute(sql).fetchall())
    assert out == oracle


def test_kcore_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        kcore(_edges(spark, [(1, 2)]), k=0)


# ---- soft-dedup weights ----

def test_soft_dedup_weights_planted_twins(spark):
    # three identical docs, two identical docs, one singleton:
    # cluster sizes 3/2/1, weights 1/3, 1/2, 1 — and EVERY doc stays
    rows = [(1, "aa bb cc dd ee ff"), (2, "aa bb cc dd ee ff"),
            (3, "aa bb cc dd ee ff"), (4, "gg hh ii jj kk ll"),
            (5, "gg hh ii jj kk ll"), (6, "mm nn oo pp qq rr")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["cluster_size"], r["weight"])
           for r in dedup.soft_dedup_weights(
               df, threshold=0.5, method="exact").collect()}
    assert len(out) == 6
    for d in (1, 2, 3):
        assert out[d] == (3, pytest.approx(1 / 3))
    for d in (4, 5):
        assert out[d] == (2, 0.5)
    assert out[6] == (1, 1.0)
    # each cluster contributes one document's worth of mass
    assert sum(w for _, w in out.values()) == pytest.approx(3.0)


def test_soft_dedup_weights_no_dups_all_ones(spark):
    rows = [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.soft_dedup_weights(df, method="exact").collect()
    assert len(out) == 5
    assert all(r["cluster_size"] == 1 and r["weight"] == 1.0
               for r in out)


# ---- KS drift view ----

def test_dist_drift_ks_terms(spark):
    a = spark.createDataFrame([(v,) for v in [1.0, 2.0, 3.0, 4.0]],
                              "x double")
    b = spark.createDataFrame([(v,) for v in [3.0, 4.0, 5.0, 6.0]],
                              "x double")
    out = (curation.dist_drift(a, b, "x", bin_width=1.0,
                               cumulative=True)
           .orderBy("bin").collect())
    # both CDFs end at exactly 1.0 (running exact counts / total)
    assert out[-1]["cdf_a"] == 1.0 and out[-1]["cdf_b"] == 1.0
    # KS statistic: at bin 2, cdf_a = 0.5 and cdf_b = 0.0
    assert max(r["ks_term"] for r in out) == pytest.approx(0.5)
    by_bin = {r["bin"]: r for r in out}
    assert by_bin[2]["cdf_a"] == 0.5 and by_bin[2]["cdf_b"] == 0.0


def test_dist_drift_plain_has_no_cdf_columns(spark):
    a = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    b = spark.createDataFrame([(1.0,), (3.0,)], "x double")
    cols = curation.dist_drift(a, b, "x").columns
    assert "cdf_a" not in cols and "ks_term" not in cols
    assert cols == ["bin", "cnt_a", "cnt_b", "share_a", "share_b",
                    "chi2_term", "tvd_term"]


def test_dist_drift_identical_sides_ks_zero(spark):
    a = spark.createDataFrame([(v,) for v in [1.0, 2.0, 5.0]],
                              "x double")
    out = curation.dist_drift(a, a, "x", bin_width=1.0,
                              cumulative=True).collect()
    assert all(r["ks_term"] == 0.0 for r in out)


# ---- HITS ----

def _hits_values_cte(edges):
    return ("edges(src, dst) AS (VALUES "
            + ", ".join(f"({a}, {b})" for a, b in edges) + ")")


def test_hits_matches_unrolled_oracle(spark):
    from pydin_spark.operators.graph import hits, hits_oracle_sql
    edges = [(1, 3), (2, 3), (1, 4), (2, 4), (3, 5), (4, 5), (5, 1),
             (7, 8)]
    out = sorted(tuple(r) for r in
                 hits(_edges(spark, edges), iterations=5).collect())
    oracle = sorted(tuple(r) for r in duckdb.connect().execute(
        hits_oracle_sql(_hits_values_cte(edges),
                        iterations=5)).fetchall())
    assert out == oracle


def test_hits_source_sink_roles(spark):
    from pydin_spark.operators.graph import HITS_SCALE, hits
    # pure sources (no in-edges) have authority 0; pure sinks (no
    # out-edges) have hub 0; each column's mass is bounded by SCALE
    edges = [(1, 10), (2, 10), (3, 10), (1, 11), (2, 11)]
    out = {r["node"]: (r["auth_fp"], r["hub_fp"])
           for r in hits(_edges(spark, edges), iterations=3).collect()}
    for source in (1, 2, 3):
        assert out[source][0] == 0
    for sink in (10, 11):
        assert out[sink][1] == 0
    assert 0 < sum(a for a, _ in out.values()) <= HITS_SCALE
    assert 0 < sum(h for _, h in out.values()) <= HITS_SCALE
    # node 10 receives from three hubs, node 11 from two
    assert out[10][0] > out[11][0]


def test_hits_empty_graph(spark):
    from pydin_spark.operators.graph import hits
    assert hits(_edges(spark, []), iterations=2).count() == 0


# ---- degree histogram ----

def test_degree_histogram_known_buckets(spark):
    from pydin_spark.operators.graph import degree_histogram
    # star: hub degree 5 (bucket 2: 4-7), leaves degree 1 (bucket 0)
    star = [(0, i) for i in range(1, 6)]
    out = {r["bucket"]: r for r in
           degree_histogram(_edges(spark, star)).collect()}
    assert set(out) == {0, 2}
    assert out[0]["n_nodes"] == 5 and out[0]["min_deg"] == 1 \
        and out[0]["max_deg"] == 1 and out[0]["total_deg"] == 5
    assert out[2]["n_nodes"] == 1 and out[2]["min_deg"] == 5


def test_degree_histogram_matches_oracle(spark):
    from pydin_spark.operators.graph import (degree_histogram,
                                             degree_histogram_oracle_sql)
    edges = ([(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
             + [(10, 11)] + [(0, i) for i in range(1, 4)])
    out = sorted(tuple(r) for r in
                 degree_histogram(_edges(spark, edges)).collect())
    oracle = sorted(tuple(r) for r in duckdb.connect().execute(
        degree_histogram_oracle_sql(_hits_values_cte(edges)))
        .fetchall())
    assert out == oracle


# ---- epoch planner ----

def test_epoch_plan_exact_arithmetic(spark):
    # a: 100 tokens available, b: 100; weights 1:3 over budget 1000
    # -> targets 250/750, milli-epochs 2500/7500; unlisted source c
    # excluded from both the totals and the output
    rows = ([(i, "a", "t " * 9 + "t") for i in range(10)]
            + [(100 + i, "b", "t " * 19 + "t") for i in range(5)]
            + [(200, "c", "t t t")])
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                               "text string")
    out = {r["source"]: r for r in curation.epoch_plan(
        df, {"a": 1, "b": 3}, budget_tokens=1000).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["tokens"] == 100 and out["b"]["tokens"] == 100
    assert out["a"]["target_tokens"] == 250
    assert out["b"]["target_tokens"] == 750
    assert out["a"]["epochs_milli"] == 2500
    assert out["b"]["epochs_milli"] == 7500


def test_epoch_plan_validation(spark):
    df = spark.createDataFrame([(1, "a", "x y")],
                               "doc_id long, source string, text string")
    with pytest.raises(ValueError):
        curation.epoch_plan(df, {}, 100)
    with pytest.raises(ValueError):
        curation.epoch_plan(df, {"a": 1}, 0)
    with pytest.raises(ValueError):
        curation.epoch_plan(df, {"a": 0}, 100)


def test_epoch_plan_token_col_override(spark):
    df = spark.createDataFrame([(1, "a", 7), (2, "a", 13)],
                               "doc_id long, source string, ntok long")
    out = curation.epoch_plan(df, {"a": 1}, budget_tokens=40,
                              token_col="ntok").collect()[0]
    assert out["tokens"] == 20 and out["target_tokens"] == 40
    assert out["epochs_milli"] == 2000  # budget is 2x the corpus


# ---- rank fusion ----

def test_rank_fusion_known_ranks(spark):
    # doc 1 is best on s1 (rank 1) and worst on s2 (rank 3):
    # rrf = 1/61 + 1/63; doc 3 the mirror image — equal fused scores
    rows = [(1, 30, 5), (2, 20, 10), (3, 10, 15)]
    df = spark.createDataFrame(rows, "doc_id long, s1 long, s2 long")
    out = {r["doc_id"]: r for r in curation.rank_fusion(
        df, ["s1", "s2"], k=60).collect()}
    assert out[1]["rank_s1"] == 1 and out[1]["rank_s2"] == 3
    assert out[2]["rank_s1"] == 2 and out[2]["rank_s2"] == 2
    assert out[3]["rank_s1"] == 3 and out[3]["rank_s2"] == 1
    assert out[1]["rrf"] == pytest.approx(1 / 61 + 1 / 63)
    assert out[1]["rrf"] == out[3]["rrf"]
    assert out[2]["rrf"] == pytest.approx(2 / 62)


def test_rank_fusion_null_drops_row(spark):
    rows = [(1, 10, 1), (2, None, 2), (3, 5, 3)]
    df = spark.createDataFrame(rows, "doc_id long, s1 long, s2 long")
    out = curation.rank_fusion(df, ["s1", "s2"]).collect()
    # doc 2 has no s1 rank -> no defensible fused score -> dropped
    assert sorted(r["doc_id"] for r in out) == [1, 3]


def test_rank_fusion_validation(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, s long")
    with pytest.raises(ValueError):
        curation.rank_fusion(df, [])
    with pytest.raises(ValueError):
        curation.rank_fusion(df, ["s"], k=0)


# ---- grouped drift ----

def test_dist_drift_grouped_is_per_group(spark):
    # group g1 identical on both sides (zero drift terms); g2 fully
    # shifted — the global histogram would dilute g2's signal
    a = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g2", 1.0), ("g2", 2.0)],
        "g string, x double")
    b = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g2", 9.0), ("g2", 10.0)],
        "g string, x double")
    out = curation.dist_drift(a, b, "x", bin_width=1.0,
                              cumulative=True, group_col="g").collect()
    g1 = [r for r in out if r["g"] == "g1"]
    g2 = [r for r in out if r["g"] == "g2"]
    assert all(r["tvd_term"] == 0.0 and r["ks_term"] == 0.0
               for r in g1)
    assert max(r["ks_term"] for r in g2) == 1.0  # disjoint supports
    # per-group CDFs both end at 1.0
    for rows in (g1, g2):
        last = max(rows, key=lambda r: r["bin"])
        assert last["cdf_a"] == 1.0 and last["cdf_b"] == 1.0


def test_dist_drift_grouped_one_sided_group_fails_loudly(spark):
    a = spark.createDataFrame([("g1", 1.0)], "g string, x double")
    b = spark.createDataFrame([("g2", 1.0)], "g string, x double")
    with pytest.raises(Exception, match="zero non-NULL"):
        curation.dist_drift(a, b, "x", group_col="g").collect()


# ---- weighted jaccard ----

def test_weighted_jaccard_degenerates_to_plain(spark):
    # every shingle unique to its pair of twin docs -> df identical
    # for all shingles -> weights constant -> J_w == plain jaccard
    rows = [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee"),
            (3, "xx yy zz ww vv")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.weighted_jaccard_pairs(df, threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["jaccard_w"] == 1.0  # identical docs


def test_weighted_jaccard_rarity_beats_boilerplate(spark):
    # docs 1,2 share a RARE tail; docs 3,4 share the same-size
    # boilerplate that also floods six other docs -> the rare pair
    # scores strictly higher under weighting
    boiler = "the quick brown fox jumps"
    rare = "zeta omega kappa lambda sigma"
    rows = ([(1, rare + " unique1a unique1b"),
             (2, rare + " unique2a unique2b"),
             (3, boiler + " only3a only3b"),
             (4, boiler + " only4a only4b")]
            + [(10 + i, boiler + f" filler{i}a filler{i}b")
               for i in range(6)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["jaccard_w"]
           for r in dedup.weighted_jaccard_pairs(
               df, threshold=0.0).collect()}
    assert out[(1, 2)] > out[(3, 4)]


def test_weighted_jaccard_validation(spark):
    df = spark.createDataFrame([(1, "a b c")],
                               "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.weighted_jaccard_pairs(df, weight_scale=0)


# ---- streaming drift front door ----

def test_streaming_drift_screen_front_door(spark, tmp_path):
    """Refresh micro-batches are drift-checked against a FIXED
    reference histogram BEFORE landing: dist_drift(cumulative=True)
    runs per batch inside foreachBatch (a pure batch operator — the
    semantics carry to the stream unchanged), drift evidence lands
    keyed by batch, and a shifted batch shows up as a KS spike."""
    import json

    land = tmp_path / "in"
    land.mkdir()
    ref_vals = [100.0, 200.0, 300.0, 400.0] * 5
    ref = spark.createDataFrame([(v,) for v in ref_vals],
                                "n_chars double")
    (land / "a.json").write_text("\n".join(
        json.dumps({"doc_id": i, "n_chars": ref_vals[i % 4]})
        for i in range(20)))
    (land / "b.json").write_text("\n".join(
        json.dumps({"doc_id": 100 + i,
                    "n_chars": ref_vals[i % 4] + 1000.0})
        for i in range(20)))
    stream = (spark.readStream.schema("doc_id long, n_chars double")
              .option("maxFilesPerTrigger", 1).json(str(land)))
    out = str(tmp_path / "drift")

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        d = curation.dist_drift(ref, batch_df.select("n_chars"),
                                "n_chars", bin_width=100.0,
                                cumulative=True)
        d.withColumn("batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(out)

    q = (stream.writeStream.foreachBatch(sink).outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    ks = {}
    for r in spark.read.parquet(out).collect():
        ks[r["batch_id"]] = max(ks.get(r["batch_id"], 0.0),
                                r["ks_term"])
    assert sorted(ks.values()) == [0.0, 1.0]  # clean batch, shifted batch


# ---- review-pass regression tests ----

def test_epoch_plan_missing_listed_source_fails_loudly(spark):
    # a typo'd source name must not silently forfeit its budget share
    df = spark.createDataFrame([(1, "a", "x y z")],
                               "doc_id long, source string, text string")
    with pytest.raises(Exception, match="nope"):
        curation.epoch_plan(df, {"a": 1, "nope": 1}, 100).collect()


def test_epoch_plan_all_null_tokens_fails_loudly(spark):
    df = spark.createDataFrame([(1, "a", None), (2, "a", None)],
                               "doc_id long, source string, ntok long")
    with pytest.raises(Exception, match="zero tokens"):
        curation.epoch_plan(df, {"a": 1}, 100,
                            token_col="ntok").collect()


def test_dist_drift_grouped_null_group_dropped(spark):
    # NULL-group rows drop explicitly (documented) instead of
    # vanishing at the NULL-rejecting totals join; other groups
    # unaffected
    a = spark.createDataFrame([("g1", 1.0), (None, 2.0)],
                              "g string, x double")
    b = spark.createDataFrame([("g1", 1.0), (None, 3.0)],
                              "g string, x double")
    out = curation.dist_drift(a, b, "x", group_col="g").collect()
    assert {r["g"] for r in out} == {"g1"}
    assert all(r["tvd_term"] == 0.0 for r in out)


def test_hits_rejects_zero_iterations(spark):
    from pydin_spark.operators.graph import hits, hits_oracle_sql
    with pytest.raises(ValueError):
        hits(_edges(spark, [(1, 2)]), iterations=0)
    with pytest.raises(ValueError):
        hits_oracle_sql("edges(src, dst) AS (VALUES (1, 2))",
                        iterations=0)


def test_bigram_logprob_quantized_matches_python(spark):
    import math
    from pydin_spark.operators import text as text_ops
    rows = [(1, "a b a b"), (2, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text_ops.bigram_logprob(
        df, quantized=True).collect()}
    # corpus bigrams: (a,b)x3? -> doc1: (a,b),(b,a),(a,b); doc2:
    # (a,b),(b,c); V = 3, alpha = 0.5
    from collections import Counter
    bigs = [("a", "b"), ("b", "a"), ("a", "b"), ("a", "b"), ("b", "c")]
    pair = Counter(bigs)
    hist = Counter(w1 for w1, _ in bigs)
    V = 3

    def q(w1, w2):
        return math.floor(
            math.log((pair[(w1, w2)] + 0.5) / (hist[w1] + 0.5 * V))
            * 1e6)

    for doc_id, doc_bigs in ((1, bigs[:3]), (2, bigs[3:])):
        s = sum(q(w1, w2) for w1, w2 in doc_bigs)
        n = len(doc_bigs)
        assert out[doc_id]["sum_lp_q"] == s
        assert out[doc_id]["nlp_q"] == -((-s) // n)


# ---- embedding drift ----

def test_embedding_drift_known_shift(spark):
    from pydin_spark.operators import similarity
    a = spark.createDataFrame([([1.0, -2.0],), ([3.0, -4.0],)],
                              "embedding array<double>")
    b = spark.createDataFrame([([2.0, -2.0],), ([4.0, -4.0],)],
                              "embedding array<double>")
    out = {r["coord"]: r for r in similarity.embedding_drift(
        a, b, dim=2).collect()}
    # coord 0: means 2.0 vs 3.0 -> delta +1e6; coord 1: no shift
    assert out[0]["mean_a_q"] == 2_000_000
    assert out[0]["mean_b_q"] == 3_000_000
    assert out[0]["delta_q"] == 1_000_000
    assert out[1]["delta_q"] == 0
    # negative means take the truncate-toward-zero branch
    assert out[1]["mean_a_q"] == -3_000_000


def test_embedding_drift_truncation_negative_mean(spark):
    from pydin_spark.operators import similarity
    # sums -1 and -3 over n=2: truncate-toward-zero gives 0 and -1
    # (floor division would give -1 and -2)
    a = spark.createDataFrame(
        [([0.0000005],), ([-0.0000015],)], "embedding array<double>")
    out = similarity.embedding_drift(a, a, dim=1).collect()[0]
    # floor(0.0000005*1e6)=0, floor(-0.0000015*1e6)=-2, sum=-2, n=2
    assert out["mean_a_q"] == -1 and out["delta_q"] == 0


def test_embedding_drift_validation(spark):
    from pydin_spark.operators import similarity
    df = spark.createDataFrame([([1.0],)], "embedding array<double>")
    import pytest as _pt
    with _pt.raises(ValueError):
        similarity.embedding_drift(df, df, quant=0)


# ---- LSH planner ----

def test_lsh_plan_midpoint_tracks_threshold():
    from pydin_spark.operators.dedup import lsh_plan
    lo = lsh_plan(0.3, 64)
    hi = lsh_plan(0.8, 64)
    assert lo["bands"] * lo["rows_per_band"] == 64
    assert hi["bands"] * hi["rows_per_band"] == 64
    # lower threshold -> more bands / shorter rows (easier collision)
    assert lo["bands"] > hi["bands"]
    assert abs(lo["midpoint"] - 0.3) < 0.2
    assert abs(hi["midpoint"] - 0.8) < 0.2
    # recall at threshold is the S-curve midpoint value, ~0.5+
    assert 0.3 < lo["p_at_threshold"] < 1.0
    # the curve is monotone in s
    vals = [lo["curve"][s] for s in sorted(lo["curve"])]
    assert vals == sorted(vals)


def test_lsh_plan_default_matches_engine_defaults():
    from pydin_spark.operators.dedup import lsh_plan
    # the engine-wide default (64 hashes, threshold 0.5) should plan
    # a banding close to the hardcoded 16x4 used by minhash_lsh_pairs
    plan = lsh_plan(0.5, 64)
    assert plan["bands"] in (8, 16, 32)


def test_lsh_plan_validation():
    from pydin_spark.operators.dedup import lsh_plan
    import pytest as _pt
    with _pt.raises(ValueError):
        lsh_plan(0.0)
    with _pt.raises(ValueError):
        lsh_plan(0.5, 1)


# ---- semantic order ----

def test_semantic_order_groups_orthants(spark):
    # two tight clusters in opposite orthants of the projection must
    # come out contiguous in the export order
    import random
    rnd = random.Random(7)
    rows = []
    for i in range(10):   # cluster A: +1-ish coords
        rows.append((i, [1.0 + rnd.random() * 0.01 for _ in range(16)]))
    for i in range(10, 20):  # cluster B: -1-ish coords
        rows.append((i, [-1.0 - rnd.random() * 0.01
                         for _ in range(16)]))
    df = spark.createDataFrame(rows, "vec_id long, "
                               "embedding array<double>")
    out = curation.semantic_order(df, n_shards=2, in_dim=16)
    seq = [r["vec_id"] for r in out.orderBy("rk").collect()]
    first_half, second_half = set(seq[:10]), set(seq[10:])
    a, b = set(range(10)), set(range(10, 20))
    assert (first_half, second_half) in (
        (a, b), (b, a))  # clusters contiguous, either order


def test_semantic_order_rerun_identical(spark):
    # 16-dim vectors: the 64-dim projection expression is exercised
    # by the oracle gate; here the invariant under repartitioning is
    # the point, and the small expression keeps the 4g test session
    # out of Janino-codegen heap pressure
    rows = [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(16)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, "
                               "embedding array<double>")
    r1 = sorted(tuple(r) for r in curation.semantic_order(
        df, n_shards=4, in_dim=16).collect())
    r2 = sorted(tuple(r) for r in curation.semantic_order(
        df.repartition(7), n_shards=4, in_dim=16).collect())
    assert r1 == r2


def test_semantic_order_validates_out_dim(spark):
    df = spark.createDataFrame([(1, [1.0] * 64)],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        curation.semantic_order(df, out_dim=31)


# ---- stored histogram (drift reference) ----

def _hist_vals(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals],
                                 "x double")


def test_stored_histogram_extend_merge_equivalence(spark, tmp_path):
    from pydin_spark.operators.curation import StoredHistogram, dist_drift
    a1, a2 = [1.0, 2.0, 2.5], [2.0, 7.0, 7.5]
    b = [1.0, 7.0, 9.0]
    two = StoredHistogram(str(tmp_path / "two"), "x", bin_width=1.0)
    two.extend(_hist_vals(spark, a1))
    two.extend(_hist_vals(spark, a2))
    one = StoredHistogram(str(tmp_path / "one"), "x", bin_width=1.0)
    one.extend(_hist_vals(spark, a1 + a2))
    d_two = sorted(tuple(r) for r in
                   two.drift(_hist_vals(spark, b),
                             cumulative=True).collect())
    d_one = sorted(tuple(r) for r in
                   one.drift(_hist_vals(spark, b),
                             cumulative=True).collect())
    live = sorted(tuple(r) for r in dist_drift(
        _hist_vals(spark, a1 + a2), _hist_vals(spark, b),
        bin_width=1.0, value_col="x", cumulative=True).collect())
    assert d_two == d_one == live


def test_stored_histogram_crash_rows_invisible(spark, tmp_path):
    from pydin_spark.operators.curation import StoredHistogram
    h = StoredHistogram(str(tmp_path / "h"), "x", bin_width=1.0)
    h.extend(_hist_vals(spark, [1.0, 2.0]))
    # simulate a crashed writer: data rows land, commit row doesn't
    (spark.createDataFrame([(99, 5, "deadbeef", 7)],
                           "bin long, cnt long, batch string, seq long")
     .write.mode("append").parquet(str(tmp_path / "h" / "bins")))
    spark.catalog.refreshByPath(str(tmp_path / "h" / "bins"))
    cur = {r["bin"]: r["cnt"] for r in h.current(spark).collect()}
    assert 99 not in cur and cur == {1: 1, 2: 1}


def test_stored_histogram_maintain_collapse_serves_identically(
        spark, tmp_path):
    from pydin_spark.operators.curation import StoredHistogram
    h = StoredHistogram(str(tmp_path / "h"), "x", bin_width=1.0)
    for batch in ([1.0, 1.5], [2.0], [1.2, 3.0]):
        h.extend(_hist_vals(spark, batch))
    before = sorted(tuple(r) for r in h.current(spark).collect())
    out = h.maintain(spark)
    assert out["collapsed_batches"] == 3
    after = sorted(tuple(r) for r in h.current(spark).collect())
    assert before == after
    # collapse is idempotent: a second sweep has nothing to do
    assert "collapsed_batches" not in h.maintain(spark)


def test_stored_histogram_no_reference_fails_loudly(spark, tmp_path):
    from pydin_spark.operators.curation import StoredHistogram
    h = StoredHistogram(str(tmp_path / "empty"), "x")
    with pytest.raises(ValueError, match="no committed reference"):
        h.drift(_hist_vals(spark, [1.0]))


def test_stored_histogram_grouped(spark, tmp_path):
    from pydin_spark.operators.curation import StoredHistogram
    h = StoredHistogram(str(tmp_path / "g"), "x", bin_width=1.0,
                        group_col="g")
    ref = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0)],
        "g string, x double")
    h.extend(ref)
    new = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 9.0), ("b", 9.5)],
        "g string, x double")
    out = h.drift(new, cumulative=True).collect()
    ga = [r for r in out if r["g"] == "a"]
    gb = [r for r in out if r["g"] == "b"]
    assert all(r["ks_term"] == 0.0 for r in ga)   # a unchanged
    assert max(r["ks_term"] for r in gb) == 1.0   # b fully shifted


def test_stored_histogram_stream_front_door(spark, tmp_path):
    import json
    from pydin_spark.operators.curation import StoredHistogram
    h = StoredHistogram(str(tmp_path / "ref"), "x", bin_width=1.0)
    h.extend(_hist_vals(spark, [1.0, 2.0, 3.0, 4.0] * 5))
    land = tmp_path / "in"
    land.mkdir()
    (land / "clean.json").write_text("\n".join(
        json.dumps({"x": v}) for v in [1.0, 2.0, 3.0, 4.0] * 3))
    (land / "shifted.json").write_text("\n".join(
        json.dumps({"x": v + 100.0}) for v in [1.0, 2.0, 3.0, 4.0]))
    stream = (spark.readStream.schema("x double")
              .option("maxFilesPerTrigger", 1).json(str(land)))
    q = h.drift_stream(stream, str(tmp_path / "ck"),
                       str(tmp_path / "out"))
    q.awaitTermination(120)
    ks = {}
    for r in spark.read.parquet(str(tmp_path / "out")).collect():
        ks[r["batch_id"]] = max(ks.get(r["batch_id"], 0.0),
                                r["ks_term"])
    assert sorted(ks.values()) == [0.0, 1.0]


def test_stored_histogram_in_maintain_sweep(spark, tmp_path):
    # 9th member of the maintain_states fleet: the sweep collapses
    # its commit log like every other family, no special-casing
    from pydin_spark.functions.maintenance import maintain_states
    from pydin_spark.operators.curation import StoredHistogram
    h = StoredHistogram(str(tmp_path / "h"), "x", bin_width=1.0)
    h.extend(_hist_vals(spark, [1.0, 2.0]))
    h.extend(_hist_vals(spark, [2.5]))
    res = maintain_states(spark, [h], max_files=0)
    key = f"StoredHistogram[{h.path}]"
    assert key in res and "error" not in str(res[key]), res
    assert res[key]["collapsed_batches"] == 2


def test_embedding_drift_short_vector_fails_loudly(spark):
    from pydin_spark.operators import similarity
    a = spark.createDataFrame([([1.0, 2.0],), ([3.0],)],
                              "embedding array<double>")
    with pytest.raises(Exception, match="shorter than dim"):
        similarity.embedding_drift(a, a, dim=2).collect()


def test_semantic_order_key_bound_fails_loudly(spark):
    # |p0|*quant past 2^31 must raise, not silently bleed into the
    # bucket bits
    df = spark.createDataFrame([(1, [1e6] * 16), (2, [2e6] * 16)],
                               "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="coordinate field"):
        curation.semantic_order(df, n_shards=2, in_dim=16,
                                quant=10 ** 9).collect()


# ---- exact group median ----

def test_group_median_known_values(spark):
    from pydin_spark.operators.rollup import group_median
    rows = [("a", 1.0), ("a", 3.0), ("a", 100.0),          # odd: 3.0
            ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 10.0),  # even: 2.5
            ("c", 7.0), ("c", None)]                        # NULL drops
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: (r["n"], r["median"])
           for r in group_median(df, "v", ["g"]).collect()}
    assert out["a"] == (3, 3.0)
    assert out["b"] == (4, 2.5)
    assert out["c"] == (1, 7.0)


def test_group_median_tie_invariant(spark):
    # duplicated values around the middle: whichever rows the window
    # ranks first, the value at the median positions is the same
    from pydin_spark.operators.rollup import group_median
    rows = [("g", v) for v in [5.0, 5.0, 5.0, 1.0, 9.0, 9.0]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = group_median(df, "v", ["g"]).collect()[0]
    assert out["n"] == 6 and out["median"] == 5.0


def test_group_median_requires_groups(spark):
    from pydin_spark.operators.rollup import group_median
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        group_median(df, "v", [])


# ---- compression ratio (no-oracle Arrow stage) ----

def test_compression_ratio_matches_stdlib(spark):
    import zlib
    from pydin_spark.operators import text as text_ops
    rows = [(1, "aaaa aaaa aaaa aaaa aaaa aaaa"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text_ops.compression_ratio(df).collect()}
    for doc_id, t in rows[:2]:
        raw = t.encode("utf-8")
        comp = zlib.compress(raw, 6)
        assert out[doc_id]["n_bytes"] == len(raw)
        assert out[doc_id]["n_compressed"] == len(comp)
        assert out[doc_id]["ratio"] == len(comp) / len(raw)
    # boilerplate compresses far harder than varied prose
    assert out[1]["ratio"] < out[2]["ratio"]
    for empty in (3, 4):
        assert out[empty]["n_bytes"] == 0
        assert out[empty]["ratio"] is None


def test_compression_ratio_validation(spark):
    from pydin_spark.operators import text as text_ops
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text_ops.compression_ratio(df, level=10)


# ---- IVF semantic order (pytest-pinned tier, no oracle by design) ----

def _planted_clusters(spark, straddle=True):
    # cluster A hugs the orthant hyperplane of projection coordinate
    # 0: half its members land just positive, half just negative —
    # the orthant tier SPLITS it by construction; cluster B is far
    # away in the same halfspace
    import random
    rnd = random.Random(11)
    rows = []
    for i in range(10):   # cluster A: near the hyperplane
        base = [0.001 if (i % 2 == 0 and straddle) else -0.001]
        rows.append((i, base + [5.0 + rnd.random() * 0.01
                                for _ in range(15)]))
    for i in range(10, 20):  # cluster B: far away
        rows.append((i, [-8.0 - rnd.random() * 0.01
                         for _ in range(16)]))
    return spark.createDataFrame(rows, "vec_id long, "
                                 "embedding array<double>")


def test_semantic_order_ivf_keeps_straddling_cluster_together(spark):
    from pydin_spark.operators.curation import semantic_order_ivf
    df = _planted_clusters(spark)
    out = semantic_order_ivf(df, n_shards=2, nlist=2, max_iter=5)
    seq = [r["vec_id"] for r in out.orderBy("rk").collect()]
    first, second = set(seq[:10]), set(seq[10:])
    a, b = set(range(10)), set(range(10, 20))
    # Voronoi cells keep the hyperplane-straddling cluster contiguous
    assert (first, second) in ((a, b), (b, a))


def test_semantic_order_ivf_rerun_identical_same_frame(spark):
    from pydin_spark.operators.curation import semantic_order_ivf
    df = _planted_clusters(spark, straddle=False)
    r1 = sorted(tuple(r) for r in semantic_order_ivf(
        df, n_shards=2, nlist=2, max_iter=5).collect())
    r2 = sorted(tuple(r) for r in semantic_order_ivf(
        df, n_shards=2, nlist=2, max_iter=5).collect())
    assert r1 == r2


def test_semantic_order_ivf_repartition_keeps_contiguity(spark):
    # across a REPARTITIONED rerun bit-identical keys are NOT promised
    # (MLlib k-means init follows partition layout — documented); the
    # contract that must survive is cluster contiguity in the export,
    # with cells in canonical centroid order
    from pydin_spark.operators.curation import semantic_order_ivf
    df = _planted_clusters(spark, straddle=False)
    for frame in (df, df.repartition(5)):
        seq = [r["vec_id"] for r in semantic_order_ivf(
            frame, n_shards=2, nlist=2, max_iter=5)
            .orderBy("rk").collect()]
        first, second = set(seq[:10]), set(seq[10:])
        a, b = set(range(10)), set(range(10, 20))
        assert (first, second) in ((a, b), (b, a))


def test_semantic_order_ivf_validates_nlist(spark):
    from pydin_spark.operators.curation import semantic_order_ivf
    df = spark.createDataFrame([(1, [1.0])],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        semantic_order_ivf(df, nlist=0)


# ---- ICWS weighted MinHash (approximate by construction) ----

def test_icws_agreement_tracks_weighted_jaccard(spark):
    # two doc pairs with very different weighted overlap: the
    # per-hash agreement rate must order the same way and sit in the
    # right neighborhood (Bernoulli(J_w) per hash, 32 hashes)
    near = "alpha beta gamma delta epsilon zeta eta theta"
    far = "iota kappa lambdax mu nu xi omicron pi"
    rows = [(1, near), (2, near + " extra1"),     # high J_w
            (3, near), (4, far)]                  # ~zero J_w
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r["sig"] for r in dedup.icws_signatures(
        df, num_hashes=32, max_shingle_freq=None).collect()}

    def agree(x, y):
        return sum(1 for a, b in zip(sig[x], sig[y]) if a == b) / 32

    assert agree(1, 2) > 0.4          # heavy overlap
    assert agree(3, 4) < 0.2          # disjoint shingles
    assert agree(1, 2) > agree(3, 4)
    assert agree(1, 3) == 1.0         # identical docs agree on all


def test_icws_consistency_same_shingle_same_sample(spark):
    # consistency is THE property: a shingle draws the same
    # randomness in every document, so identical docs have identical
    # signatures regardless of what else is in the corpus
    rows = [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee"),
            (3, "zz yy xx ww vv")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r["sig"] for r in dedup.icws_signatures(
        df, num_hashes=8, max_shingle_freq=None).collect()}
    assert sig[1] == sig[2]
    assert sig[1] != sig[3]


def test_icws_lsh_recall_on_planted_pairs(spark):
    # planted twins must surface as candidates and survive the exact
    # weighted verify; unrelated docs must not
    rows = []
    for i in range(20):
        base = " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base + " tail"))   # near-dup twin
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.icws_lsh_pairs(df, num_hashes=16, bands=8,
                               threshold=0.5,
                               max_shingle_freq=None).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, (recall, sorted(got)[:5])
    # verified pairs carry the exact weighted score
    assert all(r["jaccard_w"] >= 0.5 for r in out)
    # nothing across unrelated bases survives the exact verify
    assert got <= planted


def test_icws_lsh_validates_banding(spark):
    df = spark.createDataFrame([(1, "a b c")],
                               "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.icws_lsh_pairs(df, num_hashes=16, bands=5)
    with pytest.raises(ValueError):   # not ZeroDivisionError
        dedup.icws_lsh_pairs(df, num_hashes=16, bands=0)


def test_drop_near_dups_weighted_measure(spark):
    # the weighted measure separates boilerplate-sharing from
    # rare-sharing at one threshold where plain jaccard cannot:
    # both pairs share 50% of their shingle SET, but the rare pair
    # shares the heavy mass
    boiler = "the quick brown fox jumps over"   # floods 8 docs
    rare = "zeta omega kappa lambda sigma tau"
    rows = ([(1, rare + " only1a only1b only1c only1d only1e only1f"),
             (2, rare + " only2a only2b only2c only2d only2e only2f"),
             (3, boiler + " x3a x3b x3c x3d x3e x3f"),
             (4, boiler + " x4a x4b x4c x4d x4e x4f")]
            + [(10 + i, boiler + f" f{i}a f{i}b f{i}c f{i}d f{i}e f{i}f")
               for i in range(6)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pydin_spark.operators.dedup import weighted_jaccard_pairs
    jw = {(r["id_a"], r["id_b"]): r["jaccard_w"]
          for r in weighted_jaccard_pairs(
              df, threshold=0.0, max_shingle_freq=None).collect()}
    thr = (jw[(3, 4)] + jw[(1, 2)]) / 2   # between the two pairs
    kept = dedup.drop_near_dups(df, threshold=thr, method="exact",
                                max_shingle_freq=None,
                                measure="weighted")
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 2 not in ids          # rare twin scrubbed (1 survives)
    assert 1 in ids and 3 in ids and 4 in ids  # boiler pair kept
    with pytest.raises(ValueError):
        dedup.drop_near_dups(df, measure="nope")


def test_drop_near_dups_weighted_minhash_tier(spark):
    # the ICWS tier scrubs planted twins through banded candidates
    rows = []
    for i in range(10):
        base = " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base + " tail"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = dedup.drop_near_dups(df, threshold=0.5, method="minhash",
                                max_shingle_freq=None,
                                measure="weighted")
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {2 * i for i in range(10)}  # lower twin survives
