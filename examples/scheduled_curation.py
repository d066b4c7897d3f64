"""Scheduled training-data curation — the full production loop.

Run:  python examples/scheduled_curation.py [workdir]

Shows how the pieces compose the way a reference user would deploy
them: a pipeline config on disk, a scheduler job that executes it as
an ISOLATED subprocess driver (process-per-job, reference parity), a
failure notifier, run history, and then the curation operators
(stratified sample → quality/language filter → near-dup scrub →
sequence packing) over the surviving corpus.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pydin_spark import get_session, load_table
from pydin_spark.launcher import register_pipeline_job
from pydin_spark.operators import curation
from pydin_spark.scheduler import History, Scheduler

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    os.makedirs(work, exist_ok=True)

    # 1. a declarative pipeline config (pd_node_config shape)
    cfg = f"{work}/ingest.json"
    json.dump([
        {"node_type": "Select",
         "text": "SELECT doc_id, text, lang FROM documents"},
        {"node_type": "Table", "source_name": "lake",
         "schema_name": "raw", "table_name": "docs"},
    ], open(cfg, "w"))

    # 2. schedule it as a subprocess driver with alarming
    alerts = []
    sched = Scheduler(History(f"{work}/meta.db"), notifier=alerts.append)
    job_id = register_pipeline_job(
        sched, "ingest-docs", cfg, views=SF_DIR, lake=f"{work}/lake",
        db=f"{work}/meta.db", timeout=300,
        rerun_limit=2, rerun_interval=60, rerun_days=2,
        email_list="data-oncall@example.com")
    run_id = sched.run_job_now(job_id, wait=True)
    run = sched.history.run(run_id)
    print(f"ingest run {run_id}: status={run['status']}"
          + (f" alerts={len(alerts)}" if alerts else ""))

    # 3. curate the landed corpus in-process
    spark = get_session("curation", master="local[8]")
    docs = load_table(spark, SF_DIR, "documents")
    balanced = curation.sample_stratified(
        docs, fraction=0.9, strata_col="lang", rates={"en": 0.5})
    curated = curation.curate_corpus(balanced, language="en",
                                     min_quality=0.5, dedup_threshold=0.5)
    packed = curation.pack_sequences(curated, capacity=512)
    n_docs = curated.count()
    n_bins = packed.selectExpr("max(bin_id) + 1 AS b").first()["b"]
    print(f"curated: {n_docs} docs packed into {n_bins} x 512-token bins")
    packed.write.mode("overwrite").parquet(f"{work}/packed")
    print(f"outputs under {work}")
    spark.stop()
    t0 = time.time()
    sched.stop()
    assert time.time() - t0 < 10


if __name__ == "__main__":
    main()
