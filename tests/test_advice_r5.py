"""Regression tests for the round-4 advisor findings (ADVICE.md r4).

One test per finding:
- line_dedup on texts with CONSECUTIVE separators: exempt (empty)
  lines stay in the rebuilt text but are excluded from n_kept, and
  the DuckDB oracle twin reproduces the same rows — the divergence
  the fixture couldn't expose.
- mutual_knn_pairs accepts a correctly built graph over a corpus
  smaller than k+1 (complete graph) instead of spuriously raising.
- normalize_text(collapse_whitespace=True) collapses ASCII
  whitespace only — NBSP et al. survive, matching SQL \\s+ engines.
- Bloom filters treat NULL under SQL equality semantics: never a
  member on build, definitively absent on probe.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pydin_spark.operators import similarity, text
from pydin_spark.operators.rollup import bloom_build, bloom_contains


def test_line_dedup_consecutive_separators_exempt_rule(spark):
    # "a b" at word grain with a DOUBLE space: ["a", "", "b"] — the
    # empty piece is exempt (kept in text, not counted in n_kept)
    df = spark.createDataFrame(
        [(1, "alpha  beta"), (2, "alpha beta gamma")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.line_dedup(df, sep=" ", join_sep=" ").collect()}
    # doc 1 is corpus-first for both words; empty piece preserved
    assert out[1]["text"] == "alpha  beta"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    # doc 2 loses the duplicated words, keeps its unique one
    assert out[2]["text"] == "gamma"
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 1


def test_line_dedup_consecutive_separators_match_oracle(spark):
    """The gate's DuckDB twin must agree on texts WITH consecutive
    separators and empty pieces — the case ADVICE r4 flagged."""
    import __spark_entry__ as entry

    rows = [(1, "shared words here  and more"),
            (2, "shared words here"),
            (3, " leading space"),
            (4, "totally unique text"),
            (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 text.line_dedup(df, sep=" ", join_sep=" ").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        entry.oracle_sql()["text_line_dedup"]).fetchall()))
    assert got == want


def test_incremental_line_dedup_exempt_rule_matches_oneshot(
        spark, tmp_path):
    """The incremental deduper shares the exempt-line accounting."""
    rows = [(1, "dup line  extra"), (2, "dup line")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inc = text.IncrementalLineDeduper(str(tmp_path / "st"), sep=" ",
                                      join_sep=" ")
    got = {r["doc_id"]: tuple(r)[1:] for r in inc.ingest(df).collect()}
    want = {r["doc_id"]: tuple(r)[1:] for r in
            text.line_dedup(df, sep=" ", join_sep=" ").collect()}
    assert got == want


def test_mutual_knn_small_corpus_complete_graph_accepted(spark):
    """n <= k: the exact k-graph is the complete graph (max rnk =
    n-1 < k) and must be accepted at the same k it was built with —
    this call regressed to ValueError in round 4."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    g = similarity.knn_graph(df, k=5)
    pairs = similarity.mutual_knn_pairs(df, k=5, graph=g)
    want = similarity.mutual_knn_pairs(df, k=5)  # no-graph path
    assert sorted(map(tuple, pairs.collect())) \
        == sorted(map(tuple, want.collect()))


def test_mutual_knn_genuinely_shallow_graph_still_raises(spark):
    """A graph built at a SMALLER k over a larger corpus must still
    raise — its mutual edges would silently be the graph's k."""
    df = spark.createDataFrame(
        [(i, [float(i + 1), float(i % 3)]) for i in range(10)],
        "vec_id long, embedding array<double>")
    g = similarity.knn_graph(df, k=1)
    with pytest.raises(ValueError, match="built at k=1"):
        similarity.mutual_knn_pairs(df, k=3, graph=g)


def test_normalize_collapse_is_ascii_only(spark):
    """NBSP (U+00A0) is content, not separator — str.split() would
    eat it; the ASCII rule matches SQL regexp_replace('\\s+')."""
    rows = [(1, " a b \t c "), (2, "x y  z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in
           text.normalize_text(df, form="NFC",
                               collapse_whitespace=True).collect()}
    assert got[1] == "a b c"
    assert got[2] == "x y z"
    con = duckdb.connect()
    for i, t in rows:
        want = con.execute(
            r"SELECT trim(regexp_replace(nfc_normalize(?), '\s+', ' ',"
            r" 'g'))", [t]).fetchone()[0]
        assert got[i] == want


def test_bloom_null_never_member(spark):
    """NULL items set no bits on build; NULL probes read definitively
    absent — SQL equality semantics (NULL matches nothing)."""
    M, K = 1 << 12, 3
    items = spark.createDataFrame(
        [("x",), (None,), ("y",)], "it string")
    bl = bloom_build(items, "it", m_bits=M, k_hashes=K)
    got = {r["it"]: r["maybe_in"] for r in
           bloom_contains(items, bl, "it", m_bits=M,
                          k_hashes=K).collect()}
    assert got["x"] is True and got["y"] is True
    assert got[None] is False
    # a build of ONLY nulls yields an empty filter
    only_null = spark.createDataFrame([(None,)], "it string")
    assert bloom_build(only_null, "it", m_bits=M, k_hashes=K) \
        .count() == 0


def test_driver_priority_order_rotates_by_staleness():
    """The driver verifies a 50-slot prefix of queries() in dict
    order; the rotation must (a) lose no queries, (b) put
    never-verified queries first, (c) order the rest by ascending
    last-green round so the stalest evidence re-verifies first."""
    import __spark_entry__ as entry

    out = entry.queries()
    last = entry._last_green_rounds()
    names = list(out)
    assert len(names) == len(set(names))
    ranks = [last.get(q, -1) for q in names]
    assert ranks == sorted(ranks)  # monotone: never-green (-1) first
    # sanity: the committed CORRECTNESS files actually drive this
    assert any(r > 0 for r in ranks)
