"""VERDICT r9 items 3/7/8: pre-enumeration pair-budget guard on the
exact pairwise dedup tier, driver-collect size guard on the Arrow
cosine path, and the web `main()` signal-probe error-path audit."""

import pytest
from pyspark.sql import functions as F

from pydin_spark.operators import dedup, similarity


@pytest.fixture()
def docs(spark):
    rows = [(i, "alpha beta gamma delta epsilon zeta common tail")
            for i in range(20)]
    rows += [(100 + i, f"unique{i} words only here n{i} m{i} p{i} q{i}")
             for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---- pair-budget guard (VERDICT r9 #3) -------------------------------


def test_jaccard_refuses_past_pair_budget(docs):
    # 20 identical docs: every shared shingle has freq 20 →
    # Σ f·(f−1)/2 = 6·190 = 1140 pairs, far past a budget of 10
    with pytest.raises(ValueError, match="ngram_jaccard_pairs.*"
                                         "max_projected_pairs"):
        dedup.ngram_jaccard_pairs(docs, max_projected_pairs=10).count()


def test_jaccard_guard_fires_on_uncapped_tier(docs):
    """The accidental-100TB case the guard exists for: cap DISABLED
    (max_shingle_freq=None) must still refuse — this exercises the
    groupBy branch (no freq column on the frame)."""
    with pytest.raises(ValueError, match="max_projected_pairs"):
        dedup.ngram_jaccard_pairs(docs, max_shingle_freq=None,
                                  max_projected_pairs=10).count()


def test_jaccard_guard_none_disables_and_results_match(docs):
    a = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        docs, max_projected_pairs=None).collect()))
    b = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        docs, max_projected_pairs=10_000).collect()))
    assert a == b and len(a) >= 190  # the 20-clone clique survives


def test_guard_counts_post_cap_pairs(docs):
    """The budget applies to what will actually be enumerated: with
    max_shingle_freq=10 the 20-doc clique's shingles are shed, so a
    small budget passes."""
    out = dedup.ngram_jaccard_pairs(docs, max_shingle_freq=10,
                                    max_projected_pairs=10)
    assert out.count() == 0


@pytest.mark.parametrize("fn", [dedup.containment_pairs,
                                dedup.edit_dup_pairs,
                                dedup.weighted_jaccard_pairs])
def test_sibling_exact_tiers_share_the_guard(docs, fn):
    with pytest.raises(ValueError, match="max_projected_pairs"):
        fn(docs, max_projected_pairs=10).count()


def test_cms_tier_guard_uses_sketch_upper_bound(docs):
    with pytest.raises(ValueError, match="CMS upper bound"):
        dedup.ngram_jaccard_pairs_cms(docs, max_projected_pairs=10) \
            .count()


# ---- cosine_topk_arrow driver-collect guard (VERDICT r9 #8) ----------


def _vecs(spark, n, prefix=0):
    return spark.createDataFrame(
        [(prefix + i, [float(i), 1.0, 0.5]) for i in range(n)],
        "vec_id long, embedding array<double>")


def test_arrow_topk_refuses_oversized_query_set(spark):
    corpus = _vecs(spark, 50)
    queries = _vecs(spark, 10, prefix=1000) \
        .withColumnRenamed("vec_id", "query_id")
    with pytest.raises(ValueError, match="max_query_rows"):
        similarity.cosine_topk_arrow(corpus, queries, k=3,
                                     max_query_rows=5)


def test_arrow_topk_guard_is_limit_bounded_and_result_stable(spark):
    corpus = _vecs(spark, 50)
    queries = _vecs(spark, 3, prefix=1000) \
        .withColumnRenamed("vec_id", "query_id")
    got = similarity.cosine_topk_arrow(corpus, queries, k=3,
                                       max_query_rows=3)
    ref = similarity.cosine_topk(corpus, queries, k=3)
    assert (sorted(map(tuple, got.select("query_id", "nbr_id", "rnk")
                       .collect()))
            == sorted(map(tuple, ref.select("query_id", "nbr_id",
                                            "rnk").collect())))


# ---- web main() signal-probe audit (VERDICT r9 #7) -------------------


def _history(db):
    from pydin_spark.scheduler import History
    return History(db)


def _dead_pid():
    import subprocess
    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def test_web_stop_with_dead_pid_is_clean(tmp_path):
    """The `except ProcessLookupError: pass` in web.main('stop') only
    swallows a kill() on an already-dead recorded pid — the audited
    benign case; stop still exits 0 (nothing left to stop)."""
    pytest.importorskip("flask")
    from pydin_spark.web import main
    db = str(tmp_path / "w.db")
    _history(db).set_component("RESTAPI", status="Y", pid=_dead_pid(),
                               url="http://x")
    assert main(["stop", "--db", db]) == 0


def test_web_stop_without_server_errors(tmp_path, capsys):
    pytest.importorskip("flask")
    from pydin_spark.web import main
    db = str(tmp_path / "w.db")
    assert main(["stop", "--db", db]) == 1
    assert "not running" in capsys.readouterr().err


def test_web_route_errors_are_not_swallowed(tmp_path):
    """No route handler may hide a failure behind a blanket except:
    a driver whose method raises must surface as a 5xx, never a
    silent 200, and the auth gate must still 401 unauthenticated
    requests before any handler runs."""
    pytest.importorskip("flask")
    from pydin_spark.web import create_app

    class BoomDriver:
        def list_jobs(self, *a, **k):
            raise RuntimeError("db down")

    app = create_app(BoomDriver(), token="t0k")
    client = app.test_client()
    assert client.get("/api/jobs").status_code == 401  # gate first
    resp = client.get("/api/jobs",
                      headers={"Authorization": "Bearer t0k"})
    assert resp.status_code == 500
