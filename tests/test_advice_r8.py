"""ADVICE r8 regressions: crash-safe commit-log swaps (backup-rename +
reader self-heal + temp sweep), dataset-root-relative stats coverage,
owned-frames cache discipline on the CMS dedup tier, LRU rowcount
cache, and the deterministic (seq, batch) newest tie-break."""

import pytest
from pyspark.sql import functions as F

from pydin_spark import fs
from pydin_spark.functions.maintenance import StatsIndex, file_stats, \
    read_skipping
from pydin_spark.operators.stored import has_commit_state


def _mk_dataset(spark, path, n=64, files=4):
    (spark.range(n).select(
        F.col("id").alias("x"), (F.col("id") * 2).alias("y"))
     .repartition(files).write.mode("overwrite").parquet(path))


def test_maintain_swap_is_crash_recoverable(spark, tmp_path):
    """A crash between the commit-log swap's two renames must leave
    the log recoverable: readers self-heal from the .__old__ backup
    instead of seeing an empty family (the old delete-then-rename
    left NOTHING on disk in that window)."""
    data = str(tmp_path / "ds")
    state = str(tmp_path / "idx")
    _mk_dataset(spark, data)
    idx = StatsIndex(state, ["x"])
    idx.rebuild(spark, data)
    idx.maintain(spark)
    before = idx.read(spark).count()

    # simulate the crash window: live log renamed away to the backup,
    # replacement never landed
    fs.rename(spark, f"{state}/commits", f"{state}/commits.__old__")
    assert not fs.exists(spark, f"{state}/commits")
    # reader self-heals through has_commit_state
    assert has_commit_state(spark, state) is True
    assert fs.exists(spark, f"{state}/commits")
    assert idx.read(spark).count() == before


def test_replace_dir_restores_backup_when_live_missing(spark, tmp_path):
    """fs.replace_dir finding a backup WITHOUT a live dir is a crashed
    prior swap: it must restore (then proceed), never delete the only
    surviving copy."""
    live = str(tmp_path / "live")
    staging = str(tmp_path / "staging")
    spark.range(3).write.parquet(live)
    # crashed prior swap: live moved to backup, replacement lost
    fs.rename(spark, live, live + ".__old__")
    spark.range(7).write.parquet(staging)
    fs.replace_dir(spark, staging, live)
    # new tree is live; backup swept; nothing was destroyed mid-way
    assert spark.read.parquet(live).count() == 7
    assert not fs.exists(spark, live + ".__old__")


def test_maintain_sweeps_crashed_commit_temps(spark, tmp_path):
    """commits_next_* temp dirs from a crashed pre-swap write are
    orphans and must be swept by maintain (the data_*-only sweep
    never removed them)."""
    data = str(tmp_path / "ds")
    state = str(tmp_path / "idx")
    _mk_dataset(spark, data)
    idx = StatsIndex(state, ["x"])
    idx.rebuild(spark, data)
    spark.range(1).write.parquet(f"{state}/commits_next_deadbeef")
    out = idx.maintain(spark)
    assert out["deleted"] >= 1
    assert not any(n.startswith("commits_next_")
                   for n in fs.listdir(spark, state))
    assert idx.read(spark).count() > 0


def test_stats_guard_catches_relocated_same_named_file(spark, tmp_path):
    """Basename-only coverage comparison missed a same-named file
    relocated to a different subdirectory; the relative-path guard
    must flag it as stale."""
    import os
    import shutil

    data = str(tmp_path / "ds")
    _mk_dataset(spark, data, files=2)
    stats = file_stats(spark, data, ["x"]).persist()
    stats.count()
    # relocate one data file into a subdirectory, same basename
    name = next(f for f in os.listdir(data) if f.endswith(".parquet"))
    os.makedirs(f"{data}/sub", exist_ok=True)
    shutil.move(f"{data}/{name}", f"{data}/sub/{name}")
    with pytest.raises(ValueError, match="stale"):
        read_skipping(spark, data, stats, {"x": (0, 10)})
    stats.unpersist()


def test_cms_dedup_owned_frames_unpersist(spark, views):
    from pydin_spark.operators import dedup

    owned = []
    out = dedup.ngram_jaccard_pairs_cms(
        spark.table("documents"), threshold=0.2, max_shingle_freq=100,
        width=1024, depth=3, owned_frames=owned)
    out.count()
    # shingles + capped postings + per-doc sizes (round-10: the sizes
    # frame is persisted too — it feeds both pair sides)
    assert len(owned) == 3
    assert all(f.is_cached for f in owned)
    for f in owned:
        f.unpersist()
    assert not any(f.is_cached for f in owned)


def test_corpus_rows_cache_evicts_one_not_all(spark):
    from pydin_spark.operators import similarity as S

    S._N_HINT.clear()
    frames = [spark.range(i + 1) for i in range(5)]
    old_cap = S._N_HINT_CAP
    S._N_HINT_CAP = 4
    try:
        for f in frames[:4]:
            S._corpus_rows(f)
        assert len(S._N_HINT) == 4
        S._corpus_rows(frames[0])       # refresh recency of oldest
        S._corpus_rows(frames[4])       # overflow: evict ONE (frames[1])
        assert len(S._N_HINT) == 4      # not cleared wholesale
        key0 = (spark.sparkContext.applicationId,
                frames[0].semanticHash())
        assert key0 in S._N_HINT        # the refreshed entry survived
    finally:
        S._N_HINT_CAP = old_cap
        S._N_HINT.clear()


def test_newest_tie_break_is_deterministic(spark, tmp_path):
    """Two commit rows with the SAME seq (violated single-writer
    contract) must resolve to one deterministic winner: (seq, batch)
    descending."""
    import json as _json

    state = str(tmp_path / "idx")
    data = str(tmp_path / "ds")
    _mk_dataset(spark, data)
    idx = StatsIndex(state, ["x"])
    idx.rebuild(spark, data)           # seq 0, some batch
    row = idx._newest(spark)
    # forge a second commit with the same seq and a lexically larger
    # batch pointing at a distinguishable stats frame
    forged_batch = "z" * 12
    src = f"{state}/data_{row['seq']}_{row['batch']}"
    dst = f"{state}/data_{row['seq']}_{forged_batch}"
    spark.read.parquet(src).limit(1).write.parquet(dst)
    spark.createDataFrame(
        [(forged_batch, int(row["seq"]), _json.dumps(["x"]), data)],
        "batch string, seq long, cols_json string, dataset_path string"
    ).write.mode("append").parquet(f"{state}/commits")
    spark.catalog.refreshByPath(f"{state}/commits")
    winner = idx._newest(spark)
    assert winner["batch"] == forged_batch
    assert idx.read(spark).count() == 1  # serves the winner's frame
