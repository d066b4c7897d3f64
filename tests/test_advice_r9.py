"""ADVICE r9 regression pins (the zorder crash-window items live in
test_r11_operators.py next to the other zorder tests):

- ``Select._apply_hint`` anchors the statement's TOP-LEVEL select —
  CTE queries hint the outer statement, ``select`` inside string
  literals/comments never matches, and a select-free statement
  raises instead of silently corrupting the text.
- ``_parse_size_bytes`` honors Hadoop size suffixes, so a session
  that sets ``spark.sql.files.maxPartitionBytes=128m`` no longer
  reads as 128 BYTES and silently defeats the shingle repartition
  heuristic.
- ``read_skipping``'s staleness guard computes file paths relative
  to the CANONICALIZED dataset root, so a root whose basename also
  appears as an earlier path segment or as a nested subdirectory
  name still detects relocated files, and scheme-form differences
  (``file:/`` vs bare ``/``) never register as staleness.
"""

import pytest
from pyspark.sql import functions as F

from pydin_spark import Pipeline, Select
from pydin_spark.operators.dedup import _parse_size_bytes


# ---- Select hint anchoring ------------------------------------------


def _hinted(text: str) -> str:
    sel = Select(text=text, hint="parallel(4)")
    return sel._apply_hint(text)


def test_hint_lands_on_outer_select_of_cte():
    q = ("WITH x AS (SELECT r_regionkey AS k FROM region)\n"
         "SELECT k FROM x")
    out = _hinted(q)
    assert out == ("WITH x AS (SELECT r_regionkey AS k FROM region)\n"
                   "SELECT /*+ parallel(4) */ k FROM x")


def test_hint_skips_select_inside_string_literal_and_comment():
    q = ("-- select nothing here\n"
         "/* select neither */\n"
         "SELECT 'select me' AS s, r_name FROM region")
    out = _hinted(q)
    assert "SELECT /*+ parallel(4) */ 'select me'" in out
    assert out.count("/*+") == 1


def test_hint_handles_doubled_quote_escapes():
    q = "SELECT 'it''s a select, isn''t it' AS s FROM region"
    out = _hinted(q)
    assert out.startswith("SELECT /*+ parallel(4) */ 'it''s")


def test_hint_on_nested_cte_and_subquery_stays_top_level():
    q = ("WITH a AS (SELECT 1 AS v), b AS (\n"
         "  SELECT v FROM (SELECT v FROM a) t)\n"
         "SELECT v FROM b WHERE v IN (SELECT v FROM a)")
    out = _hinted(q)
    assert out.split("\n")[-1].startswith(
        "SELECT /*+ parallel(4) */ v FROM b")
    assert out.count("/*+") == 1


def test_hint_without_top_level_select_raises():
    with pytest.raises(ValueError, match="no top-level SELECT"):
        _hinted("DELETE FROM t WHERE id IN (SELECT id FROM dead)")


def test_hinted_cte_query_actually_runs(spark, views):
    sel = Select(text=("WITH r AS (SELECT r_regionkey FROM region) "
                       "SELECT count(*) AS n FROM r"),
                 hint="COALESCE(1)")
    sel.pipeline = Pipeline(spark=spark)
    assert sel.extract().first()["n"] == spark.table("region").count()


# ---- size-suffix parsing --------------------------------------------


@pytest.mark.parametrize("conf,expect", [
    ("134217728", 134217728),
    ("128m", 128 * 1024 * 1024),
    ("128mb", 128 * 1024 * 1024),
    ("128M", 128 * 1024 * 1024),
    ("1g", 1 << 30),
    ("2k", 2048),
    ("64b", 64),
    ("1.5g", int(1.5 * (1 << 30))),
    ("garbage", 999),
    ("", 999),
])
def test_parse_size_bytes(conf, expect):
    assert _parse_size_bytes(conf, default=999) == expect


# ---- read_skipping root-relative guard ------------------------------


def _build(spark, path):
    (spark.range(100)
     .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
     .repartition(4).write.parquet(path))
    spark.catalog.refreshByPath(path)


def test_stats_guard_ok_when_root_basename_repeats(spark, tmp_path):
    """A dataset root whose basename also appears as an earlier path
    segment (…/ds/mid/ds) must not confuse the relativity mapping —
    a healthy dataset reads clean."""
    from pydin_spark.functions import maintenance as M

    path = str(tmp_path / "ds" / "mid" / "ds")
    _build(spark, path)
    stats = M.file_stats(spark, path, ["k"])
    got = M.read_skipping(spark, path, stats, {"k": (10, 20)})
    assert got.count() == 11


def test_stats_guard_scheme_difference_is_not_staleness(spark,
                                                        tmp_path):
    """stats built against a bare path must validate against the same
    dataset addressed as file:/… — scheme form is not a file-set
    difference."""
    from pydin_spark.functions import maintenance as M

    path = str(tmp_path / "schemeds")
    _build(spark, path)
    stats = M.file_stats(spark, path, ["k"])
    got = M.read_skipping(spark, "file:" + path, stats, {"k": (0, 5)})
    assert got.count() == 6


def test_stats_guard_catches_move_into_rootlike_subdir(spark,
                                                       tmp_path):
    """Relocating a file into a nested subdirectory NAMED LIKE the
    dataset root (…/ds/ds/part-*.parquet) must read as staleness —
    the exact segment-collision the basename-search mapping got
    wrong (ADVICE r9)."""
    from pydin_spark import fs
    from pydin_spark.functions import maintenance as M

    path = str(tmp_path / "ds2")
    _build(spark, path)
    lazy = M.file_stats(spark, path, ["k"])
    # pin the stats as-of now: the frame is lazy and would re-scan
    # the post-move file set otherwise
    stats = spark.createDataFrame(lazy.collect(), lazy.schema)
    name = next(n for n in fs.listdir(spark, path)
                if n.endswith(".parquet"))
    fs.mkdirs(spark, f"{path}/ds2")
    fs.rename(spark, f"{path}/{name}", f"{path}/ds2/{name}")
    with pytest.raises(ValueError, match="stale"):
        M.read_skipping(spark, path, stats, {"k": (0, 5)})
