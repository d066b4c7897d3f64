"""Lakehouse maintenance tests: partition pruning on date-partitioned
layouts, small-file compaction."""

from pyspark.sql import functions as F

from pydin_spark import load_table
from pydin_spark.functions.maintenance import (compact, dataset_stats,
                                               write_partitioned)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_write_partitioned_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, "o_orderdate", granularity="month")
    scan = (spark.read.parquet(path)
            .where(F.col("pd_date") == "1996-03"))
    plan = plan_of(scan)
    assert "PartitionFilters" in plan
    assert "pd_date" in plan.split("PartitionFilters")[1].splitlines()[0]
    expected = orders.where(
        F.date_format("o_orderdate", "yyyy-MM") == "1996-03").count()
    assert scan.count() == expected > 0


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "many_files")
    docs.repartition(40).write.parquet(path)   # fragment on purpose
    before = dataset_stats(spark, path)
    assert before["files"] == 40
    result = compact(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert result["after"]["files"] < before["files"]
    assert spark.read.parquet(path).count() == docs.count()


# ---- Z-order layout + file-stats data skipping ----

from pydin_spark.functions.maintenance import (  # noqa: E402
    file_stats, prune_files, read_skipping, zorder_key, zorder_write)


def _morton_ref(rows, bits=16):
    """Driver-side reference: same shift-normalize + bit interleave."""
    n = len(rows[0])
    los = [min(r[i] for r in rows) for i in range(n)]
    his = [max(r[i] for r in rows) for i in range(n)]
    out = []
    for r in rows:
        key = 0
        for i in range(n):
            span = his[i] - los[i]
            if span == 0:
                continue
            s = max(0, span.bit_length() - bits)
            x = (r[i] - los[i]) >> s
            for j in range(bits):
                key += ((x >> j) & 1) << (j * n + i)
        out.append((*r, key))
    return out


def test_zorder_key_matches_reference(spark):
    rows = [(3, 900), (17, 4), (250, 250), (0, 0), (255, 1023)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(tuple(r) for r in zorder_key(df, ["x", "y"]).collect())
    assert got == sorted(_morton_ref(rows))


def test_zorder_key_wide_range_exact(spark):
    # timestamp-micros-scale spans: the shift normalization is pure
    # BIGINT — nothing overflows, nothing rounds
    rows = [(0, 5), (10**15, 7), (2 * 10**15, 9)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(tuple(r) for r in zorder_key(df, ["x", "y"]).collect())
    assert got == sorted(_morton_ref(rows))


def test_zorder_key_null_and_constant(spark):
    # NULL reads as the column min; a constant column contributes 0
    rows = [(1, 7, 5), (None, 9, 5), (4, 8, 5)]
    df = spark.createDataFrame(rows, "x long, y long, c long")
    got = {(r["x"], r["y"]): r["zkey"]
           for r in zorder_key(df, ["x", "y", "c"], bits=8).collect()}
    filled = _morton_ref([(1, 7, 5), (1, 9, 5), (4, 8, 5)], bits=8)
    assert got[(None, 9)] == {(x, y): k for x, y, _, k in filled}[(1, 9)]
    # dropping the constant column entirely gives the same ordering
    two = {(r["x"], r["y"]): r["zkey"]
           for r in zorder_key(df.select("x", "y"), ["x", "y"],
                               bits=8).collect()}
    assert sorted(got, key=got.get) == sorted(two, key=two.get)


def test_zorder_key_validates(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="63-bit"):
        zorder_key(df, ["x", "y"], bits=32)
    with _pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])


def test_zorder_layout_skips_files(spark, tmp_path):
    # a 64x64 grid, 16 files: a small query rectangle must touch a
    # small fraction of the z-ordered files but nearly all of a
    # row-major (x-sorted-only) layout's files for a y-band query
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")
    zpath = str(tmp_path / "zorder")
    zorder_write(df, zpath, ["x", "y"], n_files=16)
    stats = file_stats(spark, zpath, ["x", "y"]).cache()
    assert stats.count() == 16
    ranges = {"x": (8, 15), "y": (8, 15)}  # 1/64 of the area
    kept = prune_files(stats, ranges)
    assert len(kept) <= 4, f"z-order should bound the rectangle: {kept}"
    # correctness: skipping read == full-scan filter
    got = read_skipping(spark, zpath, stats, ranges)
    expect = (df.where("x between 8 and 15 and y between 8 and 15")
              .collect())
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect))
    # contrast: y-band query against a y-ignorant layout hits all
    # files, same query against the z-order hits a fraction
    flat = str(tmp_path / "xsorted")
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
     .write.parquet(flat))
    fstats = file_stats(spark, flat, ["x", "y"])
    yband = {"y": (0, 7)}
    assert len(prune_files(fstats, yband)) == 16, "x-layout can't skip"
    assert len(prune_files(stats, yband)) <= 8, "z-layout skips y too"


def test_prune_files_open_bounds_and_miss(spark, tmp_path):
    rows = [(i, i) for i in range(100)]
    df = spark.createDataFrame(rows, "x long, y long")
    p = str(tmp_path / "d")
    zorder_write(df, p, ["x", "y"], n_files=4)
    stats = file_stats(spark, p, ["x", "y"])
    assert len(prune_files(stats, {"x": (None, None)})) == 4
    assert prune_files(stats, {"x": (1000, None)}) == []
    out = read_skipping(spark, p, stats, {"x": (1000, None)})
    assert out.count() == 0 and "x" in out.columns
    lo_only = prune_files(stats, {"x": (90, None)})
    assert 1 <= len(lo_only) <= 2


# ---- ADVICE r7 hardening: stats coverage, URI paths, span guard ----

def test_read_skipping_raises_on_stale_stats(spark, tmp_path):
    from pyspark.sql import functions as F2
    path = str(tmp_path / "ds")
    df = spark.range(100).selectExpr("id AS x", "id * 2 AS y")
    zorder_write(df, path, ["x"], n_files=4)
    stats = file_stats(spark, path, ["x"]).localCheckpoint(eager=True)
    # sane while covered
    assert read_skipping(spark, path, stats,
                         {"x": (10, 20)}).count() == 11
    # a file lands AFTER the stats build: pruning can't see it, so the
    # default read must refuse rather than silently drop its rows
    spark.range(1000, 1010).selectExpr("id AS x", "id AS y") \
        .coalesce(1).write.mode("append").parquet(path)
    spark.catalog.refreshByPath(path)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="stale"):
        read_skipping(spark, path, stats, {"x": (10, 20)})
    # explicit opt-out for callers that serialize stats with writes
    assert read_skipping(spark, path, stats, {"x": (10, 20)},
                         check_stats=False).count() == 11


def test_read_skipping_handles_url_encodable_paths(spark, tmp_path):
    """input_file_name() URI-encodes paths; the pruned list must be
    decoded before spark.read.parquet or a dataset under a directory
    with a space/percent breaks (ADVICE r7)."""
    path = str(tmp_path / "with space" / "ds")
    df = spark.range(100).selectExpr("id AS x", "id * 3 AS y")
    zorder_write(df, path, ["x"], n_files=4)
    stats = file_stats(spark, path, ["x"])
    raw = [r["file"] for r in stats.select("file").collect()]
    assert any("%20" in f for f in raw)  # encoding actually occurred
    got = read_skipping(spark, path, stats, {"x": (5, 9)})
    assert sorted(r["x"] for r in got.collect()) == [5, 6, 7, 8, 9]


def test_zorder_key_rejects_span_past_signed64(spark):
    import pytest as _pytest
    df = spark.createDataFrame(
        [(-(2 ** 62) - 1,), (2 ** 62,)], "v long")
    with _pytest.raises(ValueError, match="signed 64-bit"):
        zorder_key(df, ["v"], bits=8).collect()
    # a full-but-legal span still works
    ok = spark.createDataFrame([(-(2 ** 61),), (2 ** 61,)], "v long")
    assert zorder_key(ok, ["v"], bits=8).count() == 2


def test_table_fingerprint_rejects_inexact_types(spark):
    import pytest as _pytest
    from pydin_spark.operators.curation import table_fingerprint
    df = spark.createDataFrame(
        [(1, 0.5, "a")], "id long, score double, t string")
    with _pytest.raises(ValueError, match="inexact"):
        table_fingerprint(df, ["id", "score"])
    # the documented cross-engine canonicalization passes
    canon = df.withColumn("score_c",
                          df.score.cast("decimal(18,6)"))
    assert table_fingerprint(canon, ["id", "score_c", "t"]).count() == 1
