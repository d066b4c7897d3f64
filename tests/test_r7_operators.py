"""Round-7 operator tests: label propagation, hard-negative mining,
snapshot diff, vocab coverage, URL extraction."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pydin_spark.operators import curation, similarity, text
from pydin_spark.operators.graph import label_propagation, lpa_oracle_sql


# ---- label propagation ----

def _lpa_edges(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_lpa_matches_unrolled_oracle(spark):
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4),
             (7, 8), (9, 9)]
    out = sorted(tuple(r) for r in label_propagation(
        _lpa_edges(spark, edges), iterations=5).collect())
    sql = lpa_oracle_sql(
        "edges(src, dst) AS (VALUES "
        + ", ".join(f"({a},{b})" for a, b in edges) + ")",
        iterations=5)
    oracle = sorted(tuple(r) for r in
                    duckdb.connect().execute(sql).fetchall())
    assert out == oracle


def test_lpa_separates_bridged_triangles(spark):
    # two triangles joined by ONE bridge edge: connected_components
    # would merge them; LPA keeps two communities
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    labels = {r["node"]: r["label"] for r in label_propagation(
        _lpa_edges(spark, edges), iterations=5).collect()}
    assert labels[1] == labels[2] == labels[3]
    assert labels[4] == labels[5] == labels[6]
    assert labels[1] != labels[4]


def test_lpa_directed_and_null_edges(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (3, None), (None, 3)],
        "src long, dst long")
    out = {r["node"]: r["label"]
           for r in label_propagation(df, iterations=3,
                                      undirected=False).collect()}
    # NULL-endpoint edges dropped: node 3 never enters the graph.
    # A directed 2-cycle OSCILLATES under synchronous updates (the
    # documented contract): after 3 (odd) rounds labels are swapped —
    # deterministically so
    assert out == {1: 2, 2: 1}


def test_lpa_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert label_propagation(df, iterations=2).count() == 0


# ---- hard negatives ----

@pytest.fixture()
def labeled_vecs(spark):
    rows = [
        (1, [1.0, 0.0], 0), (2, [0.99, 0.14], 0),
        (3, [0.98, 0.2], 1), (4, [0.0, 1.0], 1),
        (5, [0.97, 0.24], 2), (6, [-1.0, 0.0], 0),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")


def test_hard_negatives_excludes_same_label(spark, labeled_vecs):
    q = labeled_vecs.where("vec_id = 1").selectExpr(
        "vec_id AS query_id", "embedding", "label")
    out = similarity.hard_negatives(labeled_vecs, q, k=3).collect()
    nbrs = [r["nbr_id"] for r in out]
    # 2 and 6 share label 0 with the query: never negatives
    assert 2 not in nbrs and 6 not in nbrs
    # hardest different-label neighbors first
    assert nbrs[0] == 3 and nbrs[1] == 5
    assert [r["rnk"] for r in out] == [1, 2, 3]


def test_hard_negatives_max_cosine_guard(spark, labeled_vecs):
    q = labeled_vecs.where("vec_id = 1").selectExpr(
        "vec_id AS query_id", "embedding", "label")
    capped = similarity.hard_negatives(labeled_vecs, q, k=3,
                                       max_cosine=0.95).collect()
    # vecs 3 (cos 0.9798) and 5 (cos 0.9707) read as likely false
    # negatives above the cap: dropped, ranks re-close over survivors
    nbrs = [r["nbr_id"] for r in capped]
    assert nbrs == [4]
    assert [r["rnk"] for r in capped] == [1]


def test_hard_negatives_null_label_dropped(spark):
    rows = [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], None),
            (3, [0.8, 0.2], 1)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    q = df.where("vec_id = 1").selectExpr(
        "vec_id AS query_id", "embedding", "label")
    nbrs = [r["nbr_id"] for r in
            similarity.hard_negatives(df, q, k=3).collect()]
    assert nbrs == [3]  # NULL <> 0 is NULL: row 2 drops, SQL semantics


# ---- snapshot diff ----

def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "kept  intact"),
         (4, "to be removed")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "alpha beta CHANGED"), (2, "gamma delta"),
         (3, "kept intact"),  # whitespace-only churn: unchanged
         (5, "brand new")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["status"]
           for r in curation.snapshot_diff(old, new).collect()}
    assert out == {1: "changed", 2: "unchanged", 3: "unchanged",
                   4: "removed", 5: "added"}


def test_snapshot_diff_fp_columns(spark):
    old = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    new = spark.createDataFrame([(2, "y")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            curation.snapshot_diff(old, new).collect()}
    assert rows[1]["status"] == "removed" and rows[1]["new_fp"] is None
    assert rows[2]["status"] == "added" and rows[2]["old_fp"] is None


# ---- vocab coverage ----

def test_vocab_coverage_known_counts(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a  b")],  # a:4 b:3 c:1, total 8
        "doc_id long, text string")
    rows = text.vocab_coverage(df, k=2).collect()
    assert [(r["rank"], r["token"], r["cnt"]) for r in rows] == \
        [(1, "a", 4), (2, "b", 3)]
    assert rows[0]["cum_share"] == 4 / 8
    assert rows[1]["cum_share"] == 7 / 8


def test_vocab_coverage_tie_break_and_monotone(spark, views):
    rows = text.vocab_coverage(spark.table("documents"), k=50).collect()
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] <= 1.0
    for a, b in zip(rows, rows[1:]):
        assert (a["cnt"], b["token"]) >= (b["cnt"], a["token"]) or \
            a["cnt"] > b["cnt"] or (a["cnt"] == b["cnt"]
                                    and a["token"] < b["token"])


# ---- URL extraction ----

def test_extract_urls_and_blocklist(spark):
    df = spark.createDataFrame(
        [(1, "go to https://A.Example.com/x?q=1 or "
             "http://b.example.com:8080/y now"),
         (2, "no urls here"),
         (3, "tail https://c.example.com/z.")],
        "doc_id long, text string")
    out = text.extract_urls(df, blocklist=["a.example.com"]).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc
    d1 = {r["domain"]: r for r in by_doc[1]}
    assert set(d1) == {"a.example.com", "b.example.com:8080"}
    assert d1["a.example.com"]["blocked"] is True
    assert d1["b.example.com:8080"]["blocked"] is False
    # trailing punctuation kept verbatim (canonicalization is separate)
    assert by_doc[3][0]["url"].endswith("/z.")


# ---- quality bundle ----

def test_quality_bundle_flags_and_reasons(spark):
    long_en = ("the data value of the pipeline is that the data and "
               "the value keep growing while the data is in the " 
               "pipeline and the value is of the data and more text "
               "here to pass the minimum token count easily")
    df = spark.createDataFrame(
        [(1, long_en), (2, long_en),                 # 2 = exact dup of 1
         (3, "der die das und nicht " * 10),         # German
         (4, "too short")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.quality_bundle(df, langs=("en",)).collect()}
    assert out[1]["keep"] is True and out[1]["reasons"] == ""
    assert out[2]["pass_dedup"] is False and \
        out[2]["reasons"] == "duplicate"
    assert out[3]["pass_lang"] is False and "lang" in out[3]["reasons"]
    assert out[4]["pass_gopher"] is False and \
        "gopher" in out[4]["reasons"]
    # reasons list every failed rule, comma-joined in rule order
    assert all("," not in out[i]["reasons"] or
               out[i]["reasons"].split(",") ==
               [t for t in ("gopher", "lang", "duplicate")
                if t in out[i]["reasons"]] for i in out)


# ---- stored snapshot registry ----

def _snap_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stored_snapshot_matches_one_shot(spark, tmp_path):
    old = _snap_docs(spark, [(1, "a b"), (2, "c d"), (3, "e f")])
    new = _snap_docs(spark, [(1, "a b"), (2, "c d CHANGED"),
                             (4, "new doc")])
    reg = curation.StoredSnapshot(str(tmp_path / "reg"))
    counts = reg.apply(old)
    assert counts == {"added": 3, "removed": 0, "changed": 0,
                      "unchanged": 0}
    stored = sorted(map(tuple,
                        curation.StoredSnapshot(str(tmp_path / "reg"))
                        .diff(new).collect()))
    oneshot = sorted(map(tuple,
                         curation.snapshot_diff(old, new).collect()))
    assert stored == oneshot


def test_stored_snapshot_incremental_refresh_and_tombstones(
        spark, tmp_path):
    reg = curation.StoredSnapshot(str(tmp_path / "reg"))
    reg.apply(_snap_docs(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # refresh: 2 changes, 3 leaves, 4 arrives
    c = reg.apply(_snap_docs(spark, [(1, "a"), (2, "b2"), (4, "d")]))
    assert c == {"added": 1, "removed": 1, "changed": 1,
                 "unchanged": 1}
    live = {r["doc_id"] for r in reg.current(spark).collect()}
    assert live == {1, 2, 4}  # 3 tombstoned
    # partial batch (full=False): absent docs are NOT removals
    d = reg.diff(_snap_docs(spark, [(2, "b2"), (5, "x")]), full=False)
    st = {r["doc_id"]: r["status"] for r in d.collect()}
    assert st == {2: "unchanged", 5: "added"}


def test_stored_snapshot_maintain_collapses_and_serves(spark, tmp_path):
    reg = curation.StoredSnapshot(str(tmp_path / "reg"))
    reg.apply(_snap_docs(spark, [(1, "a"), (2, "b")]))
    reg.apply(_snap_docs(spark, [(1, "a"), (2, "b2"), (3, "c")]))
    before = sorted(map(tuple, reg.current(spark).collect()))
    out = reg.maintain(spark)
    assert out.get("collapsed_batches") == 2
    after = sorted(map(tuple, reg.current(spark).collect()))
    assert after == before
    # crash shape: an emptied commit log reads as no state; maintain
    # is a no-op, a fresh full apply recovers
    spark.createDataFrame([], "batch string, seq long") \
        .repartition(1).write.mode("overwrite") \
        .parquet(f"{reg.path}/commits")
    spark.catalog.refreshByPath(f"{reg.path}/commits")
    assert reg.current(spark).count() == 0
    assert "collapsed_batches" not in reg.maintain(spark)


def test_stored_snapshot_in_unified_sweep(spark, tmp_path):
    from pydin_spark.functions.maintenance import maintain_states
    reg = curation.StoredSnapshot(str(tmp_path / "reg"))
    reg.apply(_snap_docs(spark, [(1, "a")]))
    reg.apply(_snap_docs(spark, [(1, "a"), (2, "b")]))
    res = maintain_states(spark, [reg])
    key = f"StoredSnapshot[{reg.path}]"
    assert key in res and res[key].get("collapsed_batches") == 2
    empty = curation.StoredSnapshot(str(tmp_path / "none"))
    assert maintain_states(spark, [empty])[
        f"StoredSnapshot[{empty.path}]"] == {}


# ---- distribution drift ----

def test_dist_drift_identical_distributions(spark):
    a = _snap_docs(spark, [(i, "x") for i in range(10)]) \
        .selectExpr("doc_id % 3 AS v")
    out = curation.dist_drift(a, a, "v", bin_width=1.0).collect()
    assert all(r["chi2_term"] == 0.0 and r["tvd_term"] == 0.0
               for r in out)
    assert sum(r["cnt_a"] for r in out) == 10


def test_dist_drift_known_values(spark):
    # a: 4 in bin0, 0 in bin1; b: 0 in bin0, 4 in bin1 -> max drift
    a = spark.createDataFrame([(0.1,), (0.2,), (0.3,), (0.4,)], "v double")
    b = spark.createDataFrame([(1.1,), (1.2,), (1.3,), (1.4,)], "v double")
    rows = {r["bin"]: r for r in
            curation.dist_drift(a, b, "v", bin_width=1.0).collect()}
    assert set(rows) == {0, 1}
    # pooled share 0.5 each; e = 2; chi2_term = (4-2)^2/2 + (0-2)^2/2 = 4
    assert rows[0]["chi2_term"] == 4.0 and rows[1]["chi2_term"] == 4.0
    assert rows[0]["tvd_term"] == 1.0  # |4/4 - 0/4|
    # TVD = 0.5 * (1 + 1) = 1: fully disjoint distributions


def test_dist_drift_null_and_validation(spark):
    a = spark.createDataFrame([(1.0,), (None,)], "v double")
    b = spark.createDataFrame([(1.0,)], "v double")
    out = curation.dist_drift(a, b, "v").collect()
    assert len(out) == 1 and out[0]["cnt_a"] == 1  # NULL excluded
    with pytest.raises(ValueError, match="positive"):
        curation.dist_drift(a, b, "v", bin_width=0)


# ---- round-7 self-review regression pins ----

def test_stored_snapshot_string_ids(spark, tmp_path):
    """A registry over non-bigint ids (URLs) must work from the very
    first refresh — the pre-state empty frame takes the NEW snapshot's
    id type (review fix: it was hardcoded long)."""
    reg = curation.StoredSnapshot(str(tmp_path / "reg"), id_col="url")
    old = spark.createDataFrame(
        [("http://a", "x"), ("http://b", "y")], "url string, text string")
    assert reg.apply(old)["added"] == 2
    d = reg.diff(spark.createDataFrame(
        [("http://a", "x"), ("http://c", "z")],
        "url string, text string"))
    st = {r["url"]: r["status"] for r in d.collect()}
    assert st == {"http://a": "unchanged", "http://b": "removed",
                  "http://c": "added"}


def test_stored_snapshot_all_tombstoned_still_maintains(spark, tmp_path):
    """A legitimately decommissioned corpus (every doc tombstoned)
    must still collapse — the corruption guard tests COMMITTED rows,
    not live docs (review fix)."""
    reg = curation.StoredSnapshot(str(tmp_path / "reg"))
    reg.apply(_snap_docs(spark, [(1, "a"), (2, "b")]))
    c = reg.apply(spark.createDataFrame([], "doc_id long, text string"))
    assert c["removed"] == 2
    assert reg.current(spark).count() == 0
    out = reg.maintain(spark)
    assert out.get("collapsed_batches") == 2
    assert reg.current(spark).count() == 0


def test_snapshot_diff_null_text_is_present(spark):
    """NULL text is a PRESENT document with empty content — without
    the coalesce it fingerprinted to NULL and read as absent,
    re-classifying 'added' forever (review fix)."""
    old = spark.createDataFrame([(1, None), (2, "x")],
                                "doc_id long, text string")
    st = {r["doc_id"]: r["status"] for r in
          curation.snapshot_diff(old, old).collect()}
    assert st == {1: "unchanged", 2: "unchanged"}


def test_dist_drift_empty_side_fails_loudly(spark):
    a = spark.createDataFrame([(1.0,)], "v double")
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(Exception, match="zero non-NULL"):
        curation.dist_drift(a, empty, "v").collect()


# ---- domain-capped curation chain ----

def test_domain_capped_corpus_chain(spark):
    long_en = ("the data value of the pipeline is that the data and "
               "the value keep growing while the data is in the "
               "pipeline and the value is of the data and more text "
               "here to pass the minimum token count easily")
    rows = [(i, long_en + f" unique{i} see https://d{i % 2}.example.com/p")
            for i in range(1, 9)]
    rows.append((9, "too short https://d0.example.com/p"))
    rows.append((10, long_en + " unique10 https://bad.example.com/x"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.domain_capped_corpus(
        df, k_per_domain=2, langs=("en",),
        blocklist=("bad.example.com",))
    got = [(r["doc_id"], r["domain"]) for r in out.collect()]
    domains = {}
    for _id, dom in got:
        domains.setdefault(dom, []).append(_id)
    # cap honored per domain; quality + blocklist drops applied
    assert set(domains) <= {"d0.example.com", "d1.example.com"}
    assert all(len(v) <= 2 for v in domains.values())
    assert 9 not in [i for i, _ in got]    # gopher-failed
    assert 10 not in [i for i, _ in got]   # blocklisted domain
    # deterministic across reruns
    again = [(r["doc_id"], r["domain"]) for r in
             curation.domain_capped_corpus(
                 df, k_per_domain=2, langs=("en",),
                 blocklist=("bad.example.com",)).collect()]
    assert sorted(got) == sorted(again)


def test_stored_snapshot_streaming_front_door(spark, tmp_path):
    """apply_stream: each micro-batch diffs as a PARTIAL snapshot
    against the registry, the delta lands before the state commit,
    and the final registry equals the batch-API result."""
    import json
    land = tmp_path / "land"
    land.mkdir()
    (land / "a.json").write_text("\n".join(
        json.dumps({"doc_id": i, "text": f"doc {i} body"})
        for i in range(3)))
    (land / "b.json").write_text("\n".join([
        json.dumps({"doc_id": 1, "text": "doc 1 body"}),      # unchanged
        json.dumps({"doc_id": 2, "text": "doc 2 CHANGED"}),
        json.dumps({"doc_id": 7, "text": "late arrival"})]))

    reg = curation.StoredSnapshot(str(tmp_path / "reg"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(str(land)))
    q = reg.apply_stream(stream, str(tmp_path / "ckpt"),
                         delta_path=str(tmp_path / "delta"))
    q.awaitTermination(120)

    live = {r["doc_id"] for r in reg.current(spark).collect()}
    assert live == {0, 1, 2, 7}  # partial batches never remove
    delta = spark.read.parquet(str(tmp_path / "delta"))
    by = {(r["doc_id"], r["status"]) for r in delta.collect()}
    assert (7, "added") in by and (2, "changed") in by \
        and (1, "unchanged") in by
    # a follow-up FULL apply still works on stream-built state
    counts = reg.apply(spark.createDataFrame(
        [(1, "doc 1 body")], "doc_id long, text string"))
    assert counts["removed"] == 3 and counts["unchanged"] == 1


def test_token_fertility_known_values(spark):
    df = spark.createDataFrame(
        [(1, "ab cd", "w"), (2, "abcdef", "w"), (3, None, "x"),
         (4, "a  b", "x")],
        "doc_id long, text string, source string")
    rows = {r["source"]: r for r in
            text.token_fertility(df, group_cols=("source",)).collect()}
    # w: chars 5+6=11, tokens 2+1=3
    assert rows["w"]["n_chars"] == 11 and rows["w"]["n_tokens"] == 3
    assert rows["w"]["chars_per_token"] == 11 / 3
    # x: NULL text counts zero; "a  b" is 2 tokens (empties dropped)
    assert rows["x"]["n_docs"] == 2
    assert rows["x"]["n_chars"] == 4 and rows["x"]["n_tokens"] == 2


def test_sentence_chunks_rule_and_integrity(spark):
    # 4 sentences of 3/4/5/2 words, capacity 6:
    # cum_before = 0,3,7,12 -> chunks 0,0,1,2
    df = spark.createDataFrame(
        [(1, "one two three. a b c d! e f g h i? end now.")],
        "doc_id long, text string")
    rows = {r["chunk_idx"]: r for r in
            text.sentence_chunks(df, capacity=6).collect()}
    assert rows[0]["text"] == "one two three. a b c d!"
    assert rows[0]["n_sentences"] == 2 and rows[0]["n_words"] == 7
    assert rows[1]["text"] == "e f g h i?"
    assert rows[2]["text"] == "end now."
    # chunks rebuild the full sentence stream in order
    assert " ".join(rows[i]["text"] for i in sorted(rows)) == \
        "one two three. a b c d! e f g h i? end now."


def test_sentence_chunks_validation_and_empty(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert text.sentence_chunks(df, capacity=8).count() == 0
    with pytest.raises(ValueError, match="positive"):
        text.sentence_chunks(df, capacity=0)


def test_weighted_pagerank_oracle_and_semantics(spark):
    import duckdb
    from pydin_spark.operators.graph import pagerank, pagerank_oracle_sql
    edges = [(1, 2, 3), (2, 3, 1), (1, 3, 7), (3, 1, 2), (4, 1, 5),
             (2, 4, 4)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = sorted(tuple(r) for r in
                 pagerank(df, weight_col="w", iterations=6).collect())
    sql = pagerank_oracle_sql(
        "edges(src, dst, w) AS (VALUES "
        + ", ".join(f"({a},{b},{w})" for a, b, w in edges) + ")",
        iterations=6, weighted=True)
    assert out == sorted(tuple(r) for r in
                         duckdb.connect().execute(sql).fetchall())
    # all-equal weights == unweighted walk exactly
    eq = spark.createDataFrame([(a, b, 9) for a, b, _ in edges],
                               "src long, dst long, w long")
    assert sorted(map(tuple, pagerank(eq, weight_col="w").collect())) \
        == sorted(map(tuple, pagerank(eq).collect()))
    # bad weights fail loudly instead of silently rewriting the graph
    bad = spark.createDataFrame([(1, 2, 0)], "src long, dst long, w long")
    with pytest.raises(Exception, match="positive integer"):
        pagerank(bad, weight_col="w", iterations=1).collect()
