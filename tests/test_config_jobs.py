"""Config-driven pipelines (pd_node_config parity) and job scripts."""

import pytest

from pydin_spark.config import (build_node, load_pipeline_config,
                                pipeline_from_config, save_pipeline_config)
from pydin_spark.scheduler import History, Scheduler
from pydin_spark.scheduler.job import run_script, script_job
from pydin_spark.sources import Filesystem, SourceRegistry


def test_pipeline_from_config_runs(spark, views, tmp_path):
    reg = SourceRegistry(autoload=False)
    reg.register(Filesystem("lake", str(tmp_path)))
    nodes = [
        {"node_type": "Select", "text": "SELECT * FROM region"},
        {"node_type": "Mapper", "rename": {"r_name": "region_name"}},
        {"node_type": "Table", "source_name": "lake",
         "schema_name": "mart", "table_name": "regions"},
    ]
    p = pipeline_from_config(nodes, spark=spark, registry=reg).run()
    assert p.status == "D"
    out = spark.read.parquet(str(tmp_path / "mart/regions"))
    assert "region_name" in out.columns and out.count() == 5


def test_pipeline_config_branch_fork(spark, views, tmp_path):
    reg = SourceRegistry(autoload=False)
    reg.register(Filesystem("lake", str(tmp_path)))
    nodes = [
        {"node_type": "Select", "text": "SELECT * FROM nation"},
        [{"node_type": "Table", "source_name": "lake",
          "schema_name": "a", "table_name": "n"},
         {"node_type": "Table", "source_name": "lake",
          "schema_name": "b", "table_name": "n"}],
    ]
    pipeline_from_config(nodes, spark=spark, registry=reg).run()
    assert spark.read.parquet(str(tmp_path / "a/n")).count() == 25
    assert spark.read.parquet(str(tmp_path / "b/n")).count() == 25


def test_unknown_node_type_rejected():
    with pytest.raises(ValueError, match="unknown node_type"):
        build_node({"node_type": "Nope"})


def test_config_db_roundtrip():
    hist = History()
    nodes = [
        {"node_type": "Select", "text": "SELECT 1 AS x"},
        [{"node_type": "Parquet", "file_name": "a.parquet", "path": "/tmp"},
         {"node_type": "Parquet", "file_name": "b.parquet", "path": "/tmp"}],
    ]
    pid = save_pipeline_config(hist, "demo", nodes)
    assert load_pipeline_config(hist, pid) == nodes


def test_job_script_context_and_result(tmp_path):
    script = tmp_path / "script.py"
    script.write_text(
        "assert pydin.run.get('id') == 5\n"
        "assert pydin.data['inherited'] == 'yes'\n"
        "pydin.result = 42\n")
    ctx = run_script(str(script), run={"id": 5},
                     data={"inherited": "yes"})
    assert ctx.result == 42


def test_script_job_in_scheduler(tmp_path):
    script = tmp_path / "script.py"
    marker = tmp_path / "ran.txt"
    script.write_text(f"open(r'{marker}', 'w').write(str(pydin.run['id']))\n")
    s = Scheduler(History())
    job_id = s.register("scripted", func=script_job(str(script)))
    run_id = s.run_job_now(job_id, wait=True)
    assert s.history.run(run_id)["status"] == "D"
    assert marker.read_text() == str(run_id)


def test_script_error_marks_run_e(tmp_path):
    script = tmp_path / "bad.py"
    script.write_text("raise RuntimeError('script exploded')\n")
    s = Scheduler(History())
    job_id = s.register("badjob", func=script_job(str(script)))
    run_id = s.run_job_now(job_id, wait=True)
    run = s.history.run(run_id)
    assert run["status"] == "E"
    assert "script exploded" in run["error_list"]


def test_transform_node_in_config_pipeline(spark, views, tmp_path):
    """The operator kit as declarative config nodes: a JSON-shaped
    pipeline runs quality scoring + near-dup scrub between a Select
    source and a Parquet sink."""
    from pydin_spark import pipeline_from_config
    nodes = [
        {"node_type": "Select", "text": "SELECT * FROM documents"},
        {"node_type": "Transform", "operator": "drop_near_dups",
         "options": {"threshold": 0.5}},
        {"node_type": "Transform", "operator": "quality_score"},
        {"node_type": "Parquet", "file_name": "scored.parquet",
         "path": str(tmp_path)},
    ]
    pipeline_from_config(nodes, spark=spark).run()
    out = spark.read.parquet(str(tmp_path / "scored.parquet"))
    assert out.count() > 0
    assert "quality" in out.columns


def test_transform_node_rejects_unknown_operator():
    import pytest as _pytest
    from pydin_spark import Transform
    with _pytest.raises(ValueError, match="unknown operator"):
        Transform(operator="not_a_real_op")


def test_transform_registry_fully_resolves():
    """Every declarative operator name must resolve to a real function —
    a renamed operator breaks config-driven jobs at schedule time, not
    import time, unless this gate exists."""
    import importlib

    from pydin_spark.models import TRANSFORM_OPERATORS
    for name, target in TRANSFORM_OPERATORS.items():
        mod_name, fn_name = target.split(".")
        mod = importlib.import_module(f"pydin_spark.operators.{mod_name}")
        assert callable(getattr(mod, fn_name)), (name, target)


def test_declarative_theta_overlap(spark, views, tmp_path):
    from pydin_spark import pipeline_from_config
    out = str(tmp_path / "overlap")
    pipeline_from_config([
        {"node_type": "Select",
         "text": "SELECT event_type, user_id FROM events"},
        {"node_type": "Transform", "operator": "theta_overlap",
         "options": {"slice_col": "event_type", "id_col": "user_id"}},
        {"node_type": "Parquet", "file_name": "o.parquet", "path": out},
    ], spark=spark).run()
    got = spark.read.parquet(out + "/o.parquet")
    assert got.count() == 10        # C(5,2) event-type pairs
    assert "n_intersection" in got.columns
