"""Round-4 operators: Bloom membership family, bloom decontamination,
column profiling, corpus-wide line dedup."""

from pyspark.sql import functions as F

from pydin_spark.operators import curation, text
from pydin_spark.operators.rollup import (bloom_build, bloom_contains,
                                          bloom_merge)

M = 1 << 14
K = 3


def test_bloom_no_false_negatives_and_low_fp(spark):
    items = spark.range(1000).select(
        F.concat(F.lit("item"), "id").alias("it"))
    bl = bloom_build(items, "it", m_bits=M, k_hashes=K)
    # members: never a false negative
    got = bloom_contains(items, bl, "it", m_bits=M, k_hashes=K)
    assert got.where("NOT maybe_in").count() == 0
    # non-members: FP rate well under 10% at ~16 bits/item
    others = spark.range(1000).select(
        F.concat(F.lit("other"), "id").alias("it"))
    fp = bloom_contains(others, bl, "it", m_bits=M, k_hashes=K) \
        .where("maybe_in").count()
    assert fp < 100


def test_bloom_merge_equals_union_build(spark):
    a = spark.range(0, 500).select(F.concat(F.lit("x"), "id").alias("it"))
    b = spark.range(500, 900).select(F.concat(F.lit("x"), "id").alias("it"))
    merged = bloom_merge(bloom_build(a, "it", m_bits=M, k_hashes=K)
                         .union(bloom_build(b, "it", m_bits=M, k_hashes=K)))
    direct = bloom_build(a.union(b), "it", m_bits=M, k_hashes=K)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, direct.collect())))


def test_bloom_probe_side_never_shuffles(spark):
    """The whole point of the filter: probing must not shuffle the
    probe stream — k broadcast joins only."""
    items = spark.range(200).select(F.concat(F.lit("i"), "id").alias("it"))
    bl_rows = bloom_build(items, "it", m_bits=M, k_hashes=K).collect()
    bl = spark.createDataFrame(bl_rows, "word_idx long, bits long")
    probed = bloom_contains(spark.range(5000).select(
        F.concat(F.lit("i"), "id").alias("it")), bl, "it",
        m_bits=M, k_hashes=K)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_bloom_grouped_filters_are_independent(spark):
    df = spark.createDataFrame(
        [("a", "only-in-a"), ("b", "only-in-b")], "g string, it string")
    bl = bloom_build(df, "it", m_bits=M, k_hashes=K, group_cols=("g",))
    a_words = bl.where("g = 'a'").select("word_idx", "bits")
    hit = bloom_contains(
        spark.createDataFrame([("only-in-b",)], "it string"),
        a_words, "it", m_bits=M, k_hashes=K)
    assert hit.first()["maybe_in"] is False


def test_decontaminate_bloom_drops_contaminated(spark, views):
    docs = spark.table("documents")
    train = docs.where("doc_id % 2 = 0")
    # test corpus CONTAINS one full training document => containment
    # 1.0 for it, and it must be dropped
    leaked = train.limit(1)
    test = docs.where("doc_id % 2 = 1").union(leaked)
    surv = curation.decontaminate_bloom(train, test, threshold=0.9)
    leaked_id = leaked.first()["doc_id"]
    assert surv.where(F.col("doc_id") == leaked_id).count() == 0


def test_decontaminate_bloom_empty_test_keeps_all(spark, views):
    docs = spark.table("documents")
    train = docs.limit(50)
    test = docs.where("1 = 0")
    surv = curation.decontaminate_bloom(train, test, threshold=0.1)
    assert surv.count() == train.count()


def test_profile_nulls_types_and_subset(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "b", 2.5)],
        "k long, s string, v double")
    p = {r["column"]: r for r in curation.profile(df).collect()}
    assert set(p) == {"k", "s", "v"}
    assert p["s"]["n_null"] == 1 and p["v"]["n_null"] == 1
    assert p["k"]["mean_value"] == 2.0
    assert p["s"]["mean_value"] is None  # non-numeric: no mean
    assert p["k"]["min_value"] == "1" and p["k"]["max_value"] == "3"
    only = curation.profile(df, columns=["k"]).collect()
    assert len(only) == 1 and only[0]["column"] == "k"


def test_profile_numeric_min_is_numeric_not_lexicographic(spark):
    df = spark.createDataFrame([(9,), (10,), (2,)], "n long")
    row = curation.profile(df, exact_distinct=True).first()
    assert row["min_value"] == "2" and row["max_value"] == "10"


def test_line_dedup_keeps_corpus_first_occurrence(spark):
    df = spark.createDataFrame(
        [(1, "unique one\nshared boilerplate line\nunique two"),
         (2, "shared boilerplate line\nother text here"),
         (3, "shared boilerplate line")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.line_dedup(df, min_tokens=2).collect()}
    assert out[1]["text"] == ("unique one\nshared boilerplate line\n"
                              "unique two")
    assert out[2]["text"] == "other text here"
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3


def test_line_dedup_short_lines_exempt(spark):
    """Lines under min_tokens are kept everywhere, never deduped."""
    df = spark.createDataFrame(
        [(1, "ok\nlong enough line"), (2, "ok\nlong enough line")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in
           text.line_dedup(df, min_tokens=3).collect()}
    assert out[1] == "ok\nlong enough line"
    assert out[2] == "ok"  # the long line deduped, "ok" exempt


def test_line_dedup_no_line_partition_sort_window(spark):
    """Scale guard: the corpus-first pass must be an aggregate (partial
    combine on hot boilerplate keys), not row_number over the line."""
    df = spark.createDataFrame([(1, "a b"), (2, "b c")],
                               "doc_id long, text string")
    plan = text.line_dedup(df, sep=" ", join_sep=" ") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_block_pairs_duplicate_ids_spread_across_blocks(spark):
    """Roadmap #13: a heavily duplicated id space must not serialize
    into one hot block — the block key hashes (id, vector) so
    duplicates spread; and the exact knn result is unaffected."""
    import random

    from pydin_spark.operators import similarity

    rnd = random.Random(3)
    # 400 rows but only 4 distinct ids; vectors differ
    rows = [(i % 4, [rnd.uniform(-1, 1) for _ in range(4)])
            for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    counts = (df.select(F.pmod(F.xxhash64("vec_id", "embedding"),
                               F.lit(8)).alias("blk"))
              .groupBy("blk").count().collect())
    assert len(counts) == 8  # every block populated despite 4 ids
    assert max(r["count"] for r in counts) < 2 * 400 / 8


def test_stored_bloom_incremental_equals_oneshot(spark, views, tmp_path):
    """Two incremental refreshes + global serve == one-shot bloom over
    the whole history (bit-OR merging is exact)."""
    from pydin_spark.operators.rollup import StoredBloom, bloom_build

    ev = spark.table("events")
    sb = StoredBloom(str(tmp_path / "bloom"), "user_id",
                     bucket="1 day", m_bits=8192, k_hashes=K)
    cut = ev.selectExpr(
        "percentile(unix_timestamp(ts), 0.5) AS c").first()["c"]
    sb.refresh(ev.where(F.unix_timestamp("ts") <= F.lit(cut)))
    sb.refresh(ev)
    served = sorted(map(tuple, sb.serve(spark).collect()))
    direct = sorted(map(tuple, bloom_build(
        ev.select("user_id"), "user_id", m_bits=8192,
        k_hashes=K).collect()))
    assert served == direct


def test_stored_bloom_contains_and_grain_guard(spark, views, tmp_path):
    import pytest

    from pydin_spark.operators.rollup import StoredBloom

    ev = spark.table("events")
    sb = StoredBloom(str(tmp_path / "b2"), "user_id", bucket="1 hour",
                     m_bits=1 << 14, k_hashes=K)
    sb.refresh(ev)
    # every historical user must probe positive
    probe = sb.contains(ev.select("user_id").distinct(), "user_id")
    assert probe.where("NOT maybe_seen").count() == 0
    # coarser grain serves; finer grain refuses
    assert sb.serve(spark, bucket="1 day").count() > 0
    with pytest.raises(ValueError, match="whole"):
        sb.serve(spark, bucket="30 minutes")


def test_bloom_prefilter_join_matches_plain_join(spark, views):
    from pydin_spark.functions import bloom_prefilter_join

    orders = spark.table("orders")
    custs = spark.table("customer").where("c_acctbal > 5000") \
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    plain = orders.join(custs, "o_custkey")
    pref = bloom_prefilter_join(orders, custs, "o_custkey")
    assert pref.count() == plain.count()
    a = sorted(map(tuple, plain.select("o_orderkey", "c_name").collect()))
    b = sorted(map(tuple, pref.select("o_orderkey", "c_name").collect()))
    assert a == b


def test_bloom_prefilter_join_rejects_outer(spark, views):
    import pytest

    from pydin_spark.functions import bloom_prefilter_join

    with pytest.raises(ValueError, match="plain join"):
        bloom_prefilter_join(spark.table("orders"),
                             spark.table("customer"), "o_custkey",
                             how="left")


def test_quality_classifier_learns_separable_classes(spark):
    """fastText-style pipeline: train on separable synthetic classes,
    score held-out docs, accuracy near-perfect; the scoring plan stays
    broadcast-join + aggregate (no Python in the hot path)."""
    import random

    rnd = random.Random(11)
    good_w = ["insight", "analysis", "rigor", "evidence", "method"]
    bad_w = ["spam", "click", "winner", "prize", "free"]
    mk = lambda ws, n: " ".join(rnd.choice(ws) for _ in range(n))
    pos = spark.createDataFrame(
        [(i, mk(good_w, 20)) for i in range(120)],
        "doc_id long, text string")
    neg = spark.createDataFrame(
        [(1000 + i, mk(bad_w, 20)) for i in range(120)],
        "doc_id long, text string")
    w, b = curation.train_quality_classifier(pos, neg, n_buckets=512,
                                             max_iter=30)
    held = spark.createDataFrame(
        [(5000 + i, mk(good_w, 15)) for i in range(30)]
        + [(6000 + i, mk(bad_w, 15)) for i in range(30)],
        "doc_id long, text string")
    scored = curation.apply_linear_scorer(held, w, intercept=b,
                                          n_buckets=512)
    acc = scored.where(
        ((F.col("doc_id") < 6000) & F.col("keep"))
        | ((F.col("doc_id") >= 6000) & ~F.col("keep"))).count() / 60
    assert acc >= 0.95
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_apply_linear_scorer_empty_doc_gets_intercept(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    w = spark.createDataFrame([(0, 1.0)], "bucket long, w double")
    row = curation.apply_linear_scorer(df, w, intercept=0.25).first()
    assert row["margin"] == 0.25 and bool(row["keep"]) is True


def test_apply_linear_scorer_stored_features_identical(spark, views):
    docs = spark.table("documents").limit(100)
    w = (spark.range(4096)
         .select(F.col("id").alias("bucket"),
                 (((F.col("id") % 13) - 6) / 1000.0).alias("w")))
    feats = curation.hashed_ngram_buckets(docs, n_buckets=4096)
    a = sorted(map(tuple, curation.apply_linear_scorer(
        docs, w, n_buckets=4096).collect()))
    b = sorted(map(tuple, curation.apply_linear_scorer(
        docs, w, n_buckets=4096, features=feats).collect()))
    assert a == b


def test_incremental_line_dedup_equals_oneshot(spark, tmp_path):
    """Ordered-batch ingest ≡ one-shot line_dedup over the union (the
    arrival-order-first contract at its exactness point)."""
    rows = [(1, "alpha beta\nshared line one\ngamma"),
            (2, "shared line one\ndelta"),
            (3, "epsilon\nshared line two"),
            (4, "shared line two\nshared line one\nzeta"),
            (5, "eta theta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    b1, b2 = df.where("doc_id <= 2"), df.where("doc_id > 2")
    inc = text.IncrementalLineDeduper(str(tmp_path / "st"), min_tokens=1)
    got = {r["doc_id"]: tuple(r)[1:] for r in
           inc.ingest(b1).collect() + inc.ingest(b2).collect()}
    want = {r["doc_id"]: tuple(r)[1:]
            for r in text.line_dedup(df, min_tokens=1).collect()}
    assert got == want


def test_incremental_line_dedup_checkpoint_preserves_decisions(
        spark, tmp_path):
    inc = text.IncrementalLineDeduper(str(tmp_path / "st2"))
    for i in range(3):
        inc.ingest(spark.createDataFrame(
            [(i, f"common boilerplate\nunique line {i}")],
            "doc_id long, text string"))
    inc.checkpoint_state()
    assert spark.read.parquet(str(tmp_path / "st2/commits")).count() == 1
    out = inc.ingest(spark.createDataFrame(
        [(99, "common boilerplate\nunique line 0\nbrand new line")],
        "doc_id long, text string")).first()
    assert out["text"] == "brand new line" and out["n_kept"] == 1


def test_incremental_line_dedup_state_is_line_sized(spark, tmp_path):
    """The state holds one row per DISTINCT content line, not per
    occurrence — the growth contract."""
    inc = text.IncrementalLineDeduper(str(tmp_path / "st3"))
    inc.ingest(spark.createDataFrame(
        [(i, "same line everywhere") for i in range(50)],
        "doc_id long, text string"))
    assert inc.seen_lines(spark).count() == 1


def test_bloom_contains_grouped_probes_own_filter(spark):
    """group_cols: each probe row tests against ITS group's filter;
    rows in a filterless group read definitely-absent."""
    items = spark.createDataFrame(
        [("a", "in-a"), ("b", "in-b")], "g string, it string")
    bl = bloom_build(items, "it", m_bits=M, k_hashes=K,
                     group_cols=("g",))
    probes = spark.createDataFrame(
        [("a", "in-a"),   # own group: hit
         ("a", "in-b"),   # other group's item: miss
         ("b", "in-b"),   # own group: hit
         ("c", "in-a")],  # no filter for group c: miss
        "g string, it string")
    got = {(r["g"], r["it"]): r["maybe_in"] for r in
           bloom_contains(probes, bl, "it", m_bits=M, k_hashes=K,
                          group_cols=("g",)).collect()}
    assert got == {("a", "in-a"): True, ("a", "in-b"): False,
                   ("b", "in-b"): True, ("c", "in-a"): False}


def test_normalize_text_unicode_forms(spark):
    composed = "café"                     # é as one codepoint
    decomposed = "café"                  # e + combining acute
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, None),
         (4, "  AÉ  b\t c  ")],
        "doc_id long, text string")
    nfc = {r["doc_id"]: r["text"] for r in
           text.normalize_text(df, form="NFC").collect()}
    assert nfc[1] == nfc[2] == composed  # both forms converge
    assert nfc[3] is None
    full = {r["doc_id"]: r["text"] for r in
            text.normalize_text(df, casefold=True, strip_accents=True,
                                collapse_whitespace=True).collect()}
    assert full[1] == full[2] == "cafe"
    assert full[4] == "ae b c"


def test_normalize_text_matches_duckdb_nfc(spark):
    """Cross-engine NFC: the standard defines the bytes, both engines
    must agree (the oracle argument, pinned here on real unicode)."""
    import duckdb

    rows = [(1, "café naïve"), (2, "ﬁne"),  # fi ligature
            (3, "Ångström")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in
           text.normalize_text(df, form="NFC").collect()}
    con = duckdb.connect()
    for i, t in rows:
        want = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i] == want


def test_line_dedup_stream_matches_batch(spark, tmp_path):
    """Streaming ingest over a file landing zone ≡ ordered batch
    ingests; rewritten docs land in the sink."""
    rows1 = [(1, "shared line\nalpha"), (2, "beta\nshared line")]
    rows2 = [(3, "shared line\ngamma"), (4, "delta")]
    land = tmp_path / "land"
    land.mkdir()
    spark.createDataFrame(rows1, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(str(land))
    inc = text.IncrementalLineDeduper(str(tmp_path / "st"))
    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(str(land))
    q = inc.ingest_stream(stream, str(tmp_path / "ckpt"),
                          rewritten_path=str(tmp_path / "out"))
    q.awaitTermination(120)
    spark.createDataFrame(rows2, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(str(land))
    q2 = inc.ingest_stream(
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(land)), str(tmp_path / "ckpt"),
        rewritten_path=str(tmp_path / "out"))
    q2.awaitTermination(120)
    got = {r["doc_id"]: r["text"] for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    both = spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
    want = {r["doc_id"]: r["text"] for r in
            text.line_dedup(both).collect()}
    assert got == want


def test_line_dedup_ingest_replay_rederives_same_rewrite(
        spark, tmp_path, monkeypatch):
    """Crash between sink write and state commit: the replayed batch
    re-derives the same rewrite (at-least-once, never loss)."""
    import pyspark.sql.readwriter as rw

    inc = text.IncrementalLineDeduper(str(tmp_path / "st"))
    inc.ingest(spark.createDataFrame(
        [(1, "history line\nkeep me")], "doc_id long, text string"))
    batch = spark.createDataFrame(
        [(2, "history line\nfresh line")], "doc_id long, text string")
    sink = str(tmp_path / "out")

    real_parquet = rw.DataFrameWriter.parquet

    def exploding(self, path, **kw):
        if path.endswith("/commits"):
            raise RuntimeError("injected crash before commit")
        return real_parquet(self, path, **kw)

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", exploding)
    try:
        inc.ingest(batch, rewritten_path=sink)
    except RuntimeError:
        pass
    monkeypatch.undo()
    # replay: same batch, same pre-batch state -> same rewrite again
    inc.ingest(batch, rewritten_path=sink)
    out = spark.read.parquet(sink).where("doc_id = 2").collect()
    assert {r["text"] for r in out} == {"fresh line"}
