"""Round-5 operator additions: robust MAD outlier screening and
generalized deterministic weighted sampling."""

import math

import pytest
from pyspark.sql import functions as F

from pydin_spark.operators.curation import weighted_sample
from pydin_spark.operators.rollup import mad_outliers


@pytest.fixture()
def metric_df(spark):
    # group 'a': tight cluster around 10 with one wild point; group
    # 'b': constant majority (MAD = 0); plus a NULL value row
    rows = ([("a", float(v)) for v in
             [9.0, 9.5, 10.0, 10.0, 10.5, 11.0, 300.0]]
            + [("b", 5.0)] * 6 + [("b", 9.0)]
            + [("a", None)])
    return spark.createDataFrame(rows, "event_type string, value double")


def test_mad_outliers_flags_the_wild_point(metric_df):
    out = mad_outliers(metric_df, value_col="value",
                       group_cols=("event_type",), threshold=3.0)
    flagged = out.collect()
    assert [(r["event_type"], r["value"]) for r in flagged] == \
        [("a", 300.0)]
    r = flagged[0]
    # a-group median 10.0, deviations [1.0, 0.5, 0, 0, 0.5, 1.0, 290]
    # -> MAD 0.5; robust_z = 290 / 0.5
    assert r["med_value"] == 10.0
    assert r["mad_value"] == 0.5
    assert r["robust_z"] == pytest.approx(580.0)


def test_mad_outliers_zero_mad_group_never_flags(metric_df):
    # 'b' has MAD 0: robust_z is NULL there and nothing is flagged,
    # even though 9.0 differs from the constant majority
    out = mad_outliers(metric_df, value_col="value",
                       group_cols=("event_type",), threshold=3.0,
                       only_outliers=False)
    b = {r["value"]: r for r in out.where("event_type = 'b'").collect()}
    assert b[9.0]["mad_value"] == 0.0 and b[9.0]["robust_z"] is None
    flagged = mad_outliers(metric_df, value_col="value",
                           group_cols=("event_type",), threshold=3.0)
    assert flagged.where("event_type = 'b'").count() == 0


def test_mad_outliers_null_values_dropped_and_z_signed(metric_df):
    out = mad_outliers(metric_df, value_col="value",
                       group_cols=("event_type",), threshold=3.0,
                       only_outliers=False)
    # the NULL-value row is gone entirely
    assert out.where("value IS NULL").count() == 0
    a = {r["value"]: r["robust_z"]
         for r in out.where("event_type = 'a'").collect()}
    assert a[9.0] == pytest.approx(-2.0)   # below median -> negative
    assert a[11.0] == pytest.approx(2.0)   # above median -> positive


def test_weighted_sample_deterministic_and_ranked(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7 + 1)) for i in range(60)],
        "doc_id long, w double")
    a = weighted_sample(df, "w", k=10).collect()
    b = weighted_sample(df, "w", k=10).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert sorted(r["rank"] for r in a) == list(range(1, 11))
    # distinct draws: without replacement
    assert len({r["doc_id"] for r in a}) == 10


def test_weighted_sample_excludes_nonpositive_and_null_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df, "w", k=5).collect()}
    assert got == {1, 5}


def test_weighted_sample_grouped_k_per_group(spark):
    rows = [(i, "g" + str(i % 3), 1.0 + i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    out = weighted_sample(df, "w", k=4, group_cols=("grp",)).collect()
    per = {}
    for r in out:
        per.setdefault(r["grp"], []).append(r["rank"])
    assert set(per) == {"g0", "g1", "g2"}
    assert all(sorted(v) == [1, 2, 3, 4] for v in per.values())


def test_weighted_sample_tracks_weights_across_seeds(spark):
    # one heavy item (w=30) vs 29 light items (w=1): across many
    # seeds the heavy item must be drawn far more often than any
    # light one (inclusion probability ~0.5 vs ~0.017 at k=1)
    df = spark.createDataFrame(
        [(0, 30.0)] + [(i, 1.0) for i in range(1, 30)],
        "doc_id long, w double")
    wins = 0
    for seed in range(30):
        got = weighted_sample(df, "w", k=1, seed=seed).first()["doc_id"]
        wins += got == 0
    # binomial(30, ~0.5): P(wins < 6) is ~1e-4; a uniform sampler
    # (p ~ 1/30) reaches 6 with probability ~3e-4 — separable
    assert wins >= 6


def test_mad_outliers_sketch_tier_matches_exact_on_fixture(spark, views):
    # the 100 TB tier (mergeable percentile_approx medians) must flag
    # the same rows as the exact audit tier on the real fixture — MAD
    # gating only needs the bulk of the distribution, so the sketch's
    # bounded rank error cannot move the flag set at accuracy=10000
    ev = spark.table("events")
    exact = {r["event_id"] for r in mad_outliers(
        ev, value_col="value", group_cols=("event_type",),
        threshold=3.0).select("event_id").collect()}
    sketch = {r["event_id"] for r in mad_outliers(
        ev, value_col="value", group_cols=("event_type",),
        threshold=3.0, approx_accuracy=10000)
        .select("event_id").collect()}
    assert exact and sketch == exact


def test_mad_outliers_inner_math_matches_sql_percentile(spark, views):
    # the operator's F.percentile must agree with the SQL surface the
    # oracle uses (exact interpolated median) on the real fixture
    ev = spark.table("events")
    got = mad_outliers(ev, value_col="value",
                       group_cols=("event_type",),
                       only_outliers=False) \
        .select("event_type", "med_value").distinct().collect()
    want = {r["event_type"]: r["m"] for r in spark.sql(
        "SELECT event_type, percentile(value, 0.5) AS m FROM events "
        "WHERE value IS NOT NULL GROUP BY event_type").collect()}
    assert got and all(
        math.isclose(r["med_value"], want[r["event_type"]],
                     rel_tol=0, abs_tol=0) for r in got)


# ---- round-5 second batch: C4 cleaning, markup strip, boilerplate
# mining, deterministic shuffle-sharding ----

from pydin_spark.operators.curation import deterministic_shuffle
from pydin_spark.operators.text import (c4_line_filter, strip_markup,
                                        top_ngrams)


@pytest.fixture()
def pages(spark):
    rows = [
        # survives: 3 good lines (>=5 words, terminal punct)
        (1, "the quick brown fox jumps high.\n"
            "a lazy dog sleeps all day!\n"
            "short line.\n"
            "does the cat watch the birds?"),
        # doc-level kill: contains lorem ipsum
        (2, "this page is lorem ipsum filler text here.\n"
            "another fine long sentence right here.\n"
            "and one more good long line too."),
        # doc-level kill: contains '{'
        (3, "function f() { return 1; }\n"
            "a perfectly fine long sentence here.\n"
            "another perfectly fine long sentence.\n"
            "and a third fine long sentence."),
        # line-level: javascript line cut; only 2 good lines -> dropped
        (4, "please enable javascript to view this page.\n"
            "a good first content sentence here.\n"
            "a good second content sentence here."),
        # no terminal punctuation anywhere -> dropped
        (5, "navigation home about contact privacy terms\n"
            "copyright twenty twenty four all rights"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_line_filter_rules(pages):
    out = {r["doc_id"]: r for r in c4_line_filter(pages).collect()}
    assert set(out) == {1}
    r = out[1]
    # 'short line.' has < 5 words -> cut; other three kept in order
    assert r["n_lines"] == 4 and r["n_kept"] == 3
    assert r["text"].split("\n") == [
        "the quick brown fox jumps high.",
        "a lazy dog sleeps all day!",
        "does the cat watch the birds?"]


def test_c4_line_filter_trims_lines_before_rules(spark):
    # markup stripping upstream leaves trailing spaces on lines; the
    # public C4 behavior is to strip each line before testing, so a
    # line ending '. ' must still pass the terminal-punct rule and
    # come back trimmed in the rebuilt text
    df = spark.createDataFrame(
        [(1, "  the quick brown fox jumps high.  \n"
             " a lazy dog sleeps all day here. \n"
             "does the cat watch the birds now?  ")],
        "doc_id long, text string")
    out = c4_line_filter(df).collect()
    assert len(out) == 1 and out[0]["n_kept"] == 3
    assert out[0]["text"].split("\n") == [
        "the quick brown fox jumps high.",
        "a lazy dog sleeps all day here.",
        "does the cat watch the birds now?"]


def test_c4_line_filter_word_count_ignores_space_runs(spark):
    # strip_markup(collapse_whitespace=False) leaves doubled spaces
    # where tags sat; the min-words rule must count WORDS, not
    # empty split tokens — 'go  x  now.' is 3 words, never 5
    df = spark.createDataFrame(
        [(1, "go  x  now.\n"
             "a  real  sentence  with  six  words.")],
        "doc_id long, text string")
    out = c4_line_filter(df, min_lines=1).collect()
    assert len(out) == 1 and out[0]["n_kept"] == 1
    assert out[0]["text"] == "a  real  sentence  with  six  words."


def test_c4_line_filter_min_lines_knob(pages):
    # with min_lines=2 the javascript page survives on its 2 good lines
    out = {r["doc_id"] for r in
           c4_line_filter(pages, min_lines=2).collect()}
    assert out == {1, 4}


def test_strip_markup_tags_entities_and_blocks(spark):
    df = spark.createDataFrame(
        [(1, '<p class="x">Hello <b>world</b></p>'
             '<script type="t">var x = "<tag>";</script>'
             '<style>p { color: red }</style>'
             '<!-- note --> 5 &lt; 6 &amp;&amp; 7 &gt; 2, '
             'A&nbsp;B &amp;lt;'),
         (2, "no markup at all"),
         (3, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in strip_markup(df).collect()}
    assert got[1] == 'Hello world 5 < 6 && 7 > 2, A B &lt;'
    assert got[2] == "no markup at all"
    assert got[3] is None


def test_strip_markup_preserves_other_columns(spark):
    df = spark.createDataFrame([(1, "<i>x</i>", "en")],
                               "doc_id long, text string, lang string")
    r = strip_markup(df).first()
    assert (r["doc_id"], r["text"], r["lang"]) == (1, "x", "en")
    assert strip_markup(df).columns == ["doc_id", "text", "lang"]


def test_top_ngrams_doc_frequency_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c"),   # 'a b c' twice in one doc counts once
         (2, "a b c x y z"),
         (3, "x y z q r s")],
        "doc_id long, text string")
    out = top_ngrams(df, n=3, k=3).collect()
    assert [(r["ngram"], r["doc_freq"], r["rank"]) for r in out] == [
        ("a b c", 2, 1), ("x y z", 2, 2), ("b c a", 1, 3)]


def test_deterministic_shuffle_partitions_and_order(spark):
    df = spark.createDataFrame([(i,) for i in range(200)],
                               "doc_id long")
    a = deterministic_shuffle(df, n_shards=8).collect()
    b = deterministic_shuffle(df, n_shards=8).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"])
                              for r in rows)
    assert key(a) == key(b)          # reproducible
    shards = {}
    for r in a:
        shards.setdefault(r["shard"], []).append(r["pos"])
    assert set(shards) == set(range(8))          # all shards populated
    for poss in shards.values():                 # dense 1..n_s per shard
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # roughly uniform: no shard more than 2x fair share
    assert max(len(v) for v in shards.values()) <= 2 * 200 / 8
    # different seed -> different permutation
    c = deterministic_shuffle(df, n_shards=8, seed=7).collect()
    assert key(c) != key(a)


def test_deterministic_shuffle_breaks_source_order(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    rows = deterministic_shuffle(df, n_shards=4).collect()
    first = sorted([r["doc_id"] for r in rows if r["shard"] == 0][:50])
    # shard 0's ids are spread over the whole range, not a prefix
    assert max(first) > 250


# ---- profile_correlations ----

from pydin_spark.operators.curation import profile_correlations


def test_profile_correlations_known_values(spark):
    # y = 2x exactly -> corr 1; z = -x -> corr -1 with both
    df = spark.createDataFrame(
        [(float(i), 2.0 * i, -float(i)) for i in range(1, 11)],
        "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r
           for r in profile_correlations(df, ("x", "y", "z")).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert out[("x", "y")]["corr"] == pytest.approx(1.0)
    assert out[("x", "z")]["corr"] == pytest.approx(-1.0)
    assert out[("y", "z")]["corr"] == pytest.approx(-1.0)
    assert out[("x", "y")]["n"] == 10
    assert out[("x", "y")]["mean_a"] == pytest.approx(5.5)
    assert out[("x", "y")]["mean_b"] == pytest.approx(11.0)


def test_profile_correlations_pairwise_nulls_and_constant(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, 7.0), (2.0, None, 7.0), (3.0, 2.0, 7.0),
         (4.0, 9.0, None)],
        "x double, y double, c double")
    out = {(r["col_a"], r["col_b"]): r
           for r in profile_correlations(df, ("x", "y", "c")).collect()}
    # (x, y): rows 1, 3, 4 pairwise-complete
    assert out[("x", "y")]["n"] == 3
    # constant column -> zero variance -> corr NULL, means still real
    assert out[("c", "x")]["corr"] is None
    assert out[("c", "x")]["mean_a"] == pytest.approx(7.0)
    assert out[("c", "x")]["n"] == 3


def test_profile_correlations_matches_spark_corr(spark, views):
    # on the real fixture the quantized exact-sum formulation must
    # agree with Spark's native corr to quantization error
    li = spark.table("lineitem")
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in
           profile_correlations(
               li, ("l_quantity", "l_extendedprice", "l_discount"),
               scale_digits=2).collect()}
    for (a, b), v in got.items():
        native = li.agg(F.corr(a, b)).first()[0]
        assert v == pytest.approx(native, abs=1e-6), (a, b)


def test_profile_correlations_partitioning_invariant(spark):
    # the determinism claim: identical BITS regardless of partitioning
    import math
    rows = [(float(i % 17) + 0.25, float((i * 7) % 23)) for i in range(500)]
    df1 = spark.createDataFrame(rows, "x double, y double").coalesce(1)
    df32 = spark.createDataFrame(rows, "x double, y double").repartition(32)
    c1 = profile_correlations(df1, ("x", "y")).first()["corr"]
    c32 = profile_correlations(df32, ("x", "y")).first()["corr"]
    assert math.isclose(c1, c32, rel_tol=0, abs_tol=0)


# ---- streaming front door for the web-ingest chain ----

def test_streaming_web_ingest_front_door(spark, tmp_path):
    """Raw markup pages stream in: strip_markup runs as a STATELESS
    transform on the unbounded stream itself (pure projection — legal
    pre-watermark), C4 filtering + corpus-first line dedup run per
    micro-batch through IncrementalLineDeduper's state, so a
    boilerplate banner arriving in a LATER file is cut against the
    state built from an earlier one."""
    import json

    from pydin_spark.operators.text import (IncrementalLineDeduper,
                                            c4_line_filter, strip_markup)

    banner = "home about products contact subscribe today."
    land = tmp_path / "land"
    land.mkdir()

    def page(body_lines):
        return ("<html><body><p>" + banner + "</p>\n"
                + "\n".join(f"<div>{ln}</div>" for ln in body_lines)
                + '<script>var x = 1;</script></body></html>')

    batch1 = [{"doc_id": i,
               "text": page([f"unique content line number {i} here.",
                             f"another fine sentence about topic {i}."])}
              for i in range(1, 4)]
    (land / "a.json").write_text(
        "\n".join(json.dumps(d) for d in batch1))
    batch2 = [{"doc_id": 10,
               "text": page(["completely fresh second batch line here."])}]
    (land / "b.json").write_text(
        "\n".join(json.dumps(d) for d in batch2))

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(str(land)))
    clean = strip_markup(stream, collapse_whitespace=False)

    inc = IncrementalLineDeduper(str(tmp_path / "state"), min_tokens=3)
    out_path = str(tmp_path / "clean_docs")

    def sink(batch_df, batch_id):
        kept = c4_line_filter(batch_df, min_lines=1)
        inc.ingest(kept.select("doc_id", "text"),
                   rewritten_path=out_path)

    q = (clean.writeStream.foreachBatch(sink).outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(out_path).collect()}
    assert set(got) == {1, 2, 3, 10}
    # markup never reaches the state or the sink
    assert all("<" not in t for t in got.values())
    # the banner keeper is the first batch's smallest (id, pos)
    assert banner in got[1]
    assert banner not in got[2] and banner not in got[3]
    # cross-BATCH dedup: doc 10 arrives later, loses the banner to
    # state built from file a, keeps its own fresh line
    assert banner not in got[10]
    assert "completely fresh second batch line here." in got[10]


def test_deterministic_shuffle_export_rerun_identical(spark, views,
                                                      tmp_path):
    """The operator's core claim driven through the real writer path:
    two independent runs of shuffle -> repartition(shard) ->
    sortWithinPartitions(shard, pos) -> partitionBy(shard) land
    byte-equal ROW SEQUENCES per shard file, already in pos order."""
    docs = spark.table("documents").select("doc_id", "text")
    outs = [str(tmp_path / "a"), str(tmp_path / "b")]
    for out in outs:
        (deterministic_shuffle(docs, n_shards=4)
         .repartition(4, "shard")
         .sortWithinPartitions("shard", "pos")
         .write.partitionBy("shard").parquet(out))
    for s in range(4):
        runs = []
        for out in outs:
            rows = spark.read.parquet(f"{out}/shard={s}") \
                .select("doc_id", "pos").collect()
            runs.append([(r["doc_id"], r["pos"]) for r in rows])
        assert runs[0] == runs[1] and len(runs[0]) > 0
        # file order IS pos order (no re-sort needed by the loader)
        assert [p for _, p in runs[0]] == sorted(p for _, p in runs[0])


# ---- asymmetric containment dedup ----

from pydin_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs


def test_containment_catches_what_jaccard_misses(spark):
    inner = " ".join(f"w{i}" for i in range(20))          # the article
    wrapper = " ".join(f"pad{i}" for i in range(80))      # long page
    df = spark.createDataFrame(
        [(1, inner), (2, inner + " " + wrapper), (3, wrapper + " tail x y")],
        "doc_id long, text string")
    cont = {(r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(df, threshold=0.9,
                                       max_shingle_freq=None).collect()}
    # doc 1 fully inside doc 2, directed
    assert cont[(1, 2)] == pytest.approx(1.0)
    assert (2, 1) not in cont                  # reverse is diluted
    # Jaccard at the same strictness sees nothing: union is dominated
    # by the wrapper
    jac = ngram_jaccard_pairs(df, threshold=0.5,
                              max_shingle_freq=None).collect()
    assert not any({r["id_a"], r["id_b"]} == {1, 2} for r in jac)


def test_containment_no_self_pairs_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "xy zz")],
        "doc_id long, text string")
    rows = containment_pairs(df, threshold=0.9,
                             max_shingle_freq=None).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    # identical docs contain each other BOTH ways; never themselves;
    # the 2-token doc has no trigrams and never appears
    assert got == {(1, 2), (2, 1)}
    assert all(r["containment"] == pytest.approx(1.0) for r in rows)


def test_containment_frequency_cap_drops_stop_shingles(spark):
    hot = "the quick brown"
    rows = [(i, hot + f" unique{i} tail{i} end{i} stop{i}")
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # every doc shares ONLY the hot prefix trigrams; capping them
    # leaves no shared shingles at all
    assert containment_pairs(df, threshold=0.1,
                             max_shingle_freq=5).count() == 0
    assert containment_pairs(df, threshold=0.1,
                             max_shingle_freq=None).count() > 0
