"""Hadoop-FileSystem helper (`pydin_spark.fs`): the portability layer
every stored-state maintain()/compact() routes its metadata operations
through (VERDICT r7 item 1). Semantics are pinned to the os/shutil
calls it replaced — strict no-clobber rename, os.listdir-shaped
listing, rmtree-shaped delete — and every operation must behave
identically on a plain local path and an explicit-scheme file:// URI
(the stand-in for hdfs:// / s3a:// the container can actually run)."""

import os

import pytest

from pydin_spark import fs


@pytest.fixture(params=["plain", "file_uri"])
def style(request):
    return request.param


def _p(tmp_path, style, name):
    p = str(tmp_path / name)
    return f"file://{p}" if style == "file_uri" else p


def test_exists_isdir_listdir(spark, tmp_path, style):
    d = _p(tmp_path, style, "d")
    assert not fs.exists(spark, d)
    os.makedirs(str(tmp_path / "d" / "sub"))
    (tmp_path / "d" / "f.txt").write_text("x")
    assert fs.exists(spark, d)
    assert fs.is_dir(spark, d)
    assert not fs.is_dir(spark, _p(tmp_path, style, "d/f.txt"))
    assert sorted(fs.listdir(spark, d)) == ["f.txt", "sub"]
    with pytest.raises(FileNotFoundError):
        fs.listdir(spark, _p(tmp_path, style, "absent"))


def test_rename_strict_no_clobber(spark, tmp_path, style):
    os.makedirs(str(tmp_path / "a"))
    (tmp_path / "a" / "f").write_text("1")
    os.makedirs(str(tmp_path / "b"))
    # Hadoop local rename onto an existing dir would nest a INSIDE b —
    # the exact silent state corruption the helper must refuse
    with pytest.raises(OSError, match="already exists"):
        fs.rename(spark, _p(tmp_path, style, "a"),
                  _p(tmp_path, style, "b"))
    assert (tmp_path / "a" / "f").exists()  # untouched on refusal
    fs.rename(spark, _p(tmp_path, style, "a"),
              _p(tmp_path, style, "c"))
    assert (tmp_path / "c" / "f").read_text() == "1"
    assert not (tmp_path / "a").exists()


def test_delete_rmtree_shape(spark, tmp_path, style):
    os.makedirs(str(tmp_path / "t" / "deep"))
    (tmp_path / "t" / "deep" / "f").write_text("x")
    assert fs.delete(spark, _p(tmp_path, style, "t"))
    assert not (tmp_path / "t").exists()
    with pytest.raises(FileNotFoundError):
        fs.delete(spark, _p(tmp_path, style, "t"))
    assert fs.delete(spark, _p(tmp_path, style, "t"),
                     ignore_errors=True) is False


def test_replace_dir_swaps_and_sweeps(spark, tmp_path, style):
    os.makedirs(str(tmp_path / "live"))
    (tmp_path / "live" / "old").write_text("old")
    os.makedirs(str(tmp_path / "staging"))
    (tmp_path / "staging" / "new").write_text("new")
    fs.replace_dir(spark, _p(tmp_path, style, "staging"),
                   _p(tmp_path, style, "live"))
    assert (tmp_path / "live" / "new").exists()
    assert not (tmp_path / "live" / "old").exists()
    assert not (tmp_path / "staging").exists()
    assert not (tmp_path / "live.__old__").exists()  # backup swept


def test_replace_dir_first_write_and_stale_backup(spark, tmp_path,
                                                  style):
    # no live dir yet (first checkpoint) — staging just moves in
    os.makedirs(str(tmp_path / "s1"))
    (tmp_path / "s1" / "f").write_text("v1")
    fs.replace_dir(spark, _p(tmp_path, style, "s1"),
                   _p(tmp_path, style, "live"))
    assert (tmp_path / "live" / "f").read_text() == "v1"
    # a stale .__old__ from a crashed prior swap must not block
    os.makedirs(str(tmp_path / "live.__old__"))
    (tmp_path / "live.__old__" / "junk").write_text("crashed")
    os.makedirs(str(tmp_path / "s2"))
    (tmp_path / "s2" / "f").write_text("v2")
    fs.replace_dir(spark, _p(tmp_path, style, "s2"),
                   _p(tmp_path, style, "live"))
    assert (tmp_path / "live" / "f").read_text() == "v2"
    assert not (tmp_path / "live.__old__").exists()


def test_tree_stats_counts_suffix_only(spark, tmp_path, style):
    os.makedirs(str(tmp_path / "ds" / "part"))
    (tmp_path / "ds" / "a.parquet").write_bytes(b"x" * 10)
    (tmp_path / "ds" / "part" / "b.parquet").write_bytes(b"y" * 7)
    (tmp_path / "ds" / "_SUCCESS").write_text("")
    got = fs.tree_stats(spark, _p(tmp_path, style, "ds"))
    assert got == {"files": 2, "bytes": 17}
    with pytest.raises(FileNotFoundError):
        fs.tree_stats(spark, _p(tmp_path, style, "absent"))


# ---- DDL quoting hardening (VERDICT r7 item 7) ----

def test_stored_buckets_rejects_quoted_paths_and_names(spark,
                                                       tmp_path):
    from pydin_spark.operators.buckets import StoredBuckets
    with pytest.raises(ValueError, match="quote"):
        StoredBuckets(str(tmp_path / "o'brien"), "k")
    with pytest.raises(ValueError, match="quote"):
        StoredBuckets(str(tmp_path / "back`tick"), "k")
    with pytest.raises(ValueError, match="quote"):
        StoredBuckets(str(tmp_path / "ok"), "k`ey")
    sb = StoredBuckets(str(tmp_path / "ok"), "k", buckets=2)
    sb.stage(spark.range(5).selectExpr("id AS k", "id AS v"))
    with pytest.raises(ValueError, match="quote"):
        sb.attach(spark, "bad`name")
    with pytest.raises(ValueError, match="quote"):
        sb.attach(spark, "bad'name")
    assert sb.attach(spark, "sb_quote_ok").count() == 5
    spark.sql("DROP TABLE IF EXISTS sb_quote_ok")
