"""Unified stored-state maintenance — one scheduled sweep for the
whole state fleet.

Run:  python examples/state_maintenance.py [workdir]

A real deployment accumulates stored state of six kinds: near-dup
dedup state (IncrementalDeduper), line-dedup state
(IncrementalLineDeduper), continuous rollups (ContinuousRollup),
heavy-hitter summaries (StoredHeavyHitters), membership filters
(StoredBloom), and ANN indexes (IVFIndex). Each degrades in its own
way under high-cadence refresh — small-file fragmentation, unbounded
commit logs, orphan rows/versions from crashed writers, centroid
drift — and each exposes the same idempotent ``maintain(spark)``
answer. ``maintain_states`` runs them all as ONE scheduler job on a
cron cadence; per-family stats land in the run history, and a family
that fails surfaces in the results without aborting its siblings.

Every action is bounded and safe at any cadence: compaction only
fires past a file-count threshold, commit-log collapse only past a
batch-count threshold, orphan sweeps reclaim only rows/versions that
are already invisible to readers, and the IVF drift→rebuild tick is a
versioned atomic swap.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pydin_spark import get_session, load_table
from pydin_spark.functions.maintenance import maintain_states
from pydin_spark.operators.dedup import IncrementalDeduper
from pydin_spark.operators.rollup import (ContinuousRollup,
                                          StoredBloom,
                                          StoredHeavyHitters)
from pydin_spark.operators.similarity import IVFIndex
from pydin_spark.operators.text import IncrementalLineDeduper
from pydin_spark.scheduler import History, Scheduler

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 \
        else tempfile.mkdtemp(prefix="pydin_states_")
    spark = get_session("state-maintenance", master="local[4]",
                        extra_conf={"spark.sql.shuffle.partitions": "4"})
    ev = load_table(spark, SF_DIR, "events")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    # --- build a small fleet (a real deployment already has these) --
    dd = IncrementalDeduper(f"{work}/dedup", threshold=0.9)
    dd.ingest(docs.where("doc_id < 100"))
    dd.ingest(docs.where("doc_id >= 100"))

    ld = IncrementalLineDeduper(f"{work}/lines", sep=" ", join_sep=" ")
    ld.ingest(docs.where("doc_id < 100"))
    ld.ingest(docs.where("doc_id >= 100"))

    cr = ContinuousRollup(f"{work}/rollup", bucket="1 day")
    cr.refresh(ev)

    hh = StoredHeavyHitters(f"{work}/hh", "user_id", bucket="1 day",
                            capacity=16)
    hh.refresh(ev)

    sb = StoredBloom(f"{work}/bloom", "user_id", bucket="1 day")
    sb.refresh(ev)

    ivf = IVFIndex(f"{work}/ivf", nlist=4, max_iter=3,
                   keep_versions=1)
    ivf.build(emb)

    fleet = [dd, ld, cr, hh, sb, ivf]

    # --- the scheduled sweep ---------------------------------------
    def sweep(run):
        res = maintain_states(spark, fleet,
                              corpus=emb, drift_threshold=1.2)
        run["data"] = {k: ("error" if isinstance(v, dict)
                           and "error" in v else "ok")
                       for k, v in res.items()}
        for k, v in res.items():
            print(f"  {k}: {v}")

    sched = Scheduler(History())
    job_id = sched.register("state-maintenance", func=sweep)
    print("running the unified maintenance job once "
          "(cron it in production):")
    run_id = sched.run_job_now(job_id, wait=True)
    rec = sched.history.run(run_id)
    print(f"run {run_id}: status={rec['status']} "
          f"data={rec.get('data_dump')}")


if __name__ == "__main__":
    main()
