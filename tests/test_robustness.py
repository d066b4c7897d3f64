"""Robustness: re-running the same Pipeline object, distributed
Filenames listing, Mapper on empty input."""

from pydin_spark import Filenames, Mapper, Parquet, Pipeline, Select


def test_pipeline_object_reruns(spark, views, tmp_path):
    p = Pipeline(Select(text="SELECT * FROM region"),
                 Parquet(file_name="out.parquet", path=str(tmp_path)),
                 spark=spark)
    p.run()
    p.run()  # same object, fresh Observations — must not collide
    assert spark.read.parquet(str(tmp_path / "out.parquet")).count() == 10


def test_filenames_distributed_matches_walk(spark, tmp_path):
    for i in range(5):
        (tmp_path / f"f{i}.dat").write_text("x" * (i + 1))
    # identical regex mask semantics in both paths
    walk = Filenames(path=str(tmp_path), mask=r"\.dat$")
    dist = Filenames(path=str(tmp_path), mask=r"\.dat$", distributed=True)
    a = {(r["file"], r["size"]) for r in walk.extract().collect()}
    b = {(r["file"], r["size"]) for r in dist.extract().collect()}
    assert a == b


def test_mapper_func_on_empty_input(spark, views, tmp_path):
    src = Select(text="SELECT r_regionkey, r_name FROM region WHERE 1 = 0")
    mapper = Mapper(func=lambda r: {"k": r["r_regionkey"]})
    dst = Parquet(file_name="empty.parquet", path=str(tmp_path))
    Pipeline(src, mapper, dst, spark=spark).run()
    out = spark.read.parquet(str(tmp_path / "empty.parquet"))
    assert out.count() == 0
