"""Round-11 skew/spill probe (VERDICT r10 items 6 and 8): run queries
with the Spark event log on, then post-process the log into per-stage
task statistics — task-duration max/median, shuffle-read max/median,
and spill bytes — the evidence that the heavy dedup shuffles are
skew-free at a real SF (max/median < ~3x) and WHERE q_rollup_status's
sf10 wall goes.

Usage:
  python tools/skew_probe_r11.py <sf_dir> <out_json> [query ...]

Writes ``<out_json>``: {query: {stages: [{stage, name, tasks,
dur_med_ms, dur_max_ms, dur_ratio, shuf_read_med_mb, shuf_read_max_mb,
shuf_read_ratio, spill_mem_mb, spill_disk_mb}], wall_sec}} for every
stage with >= 4 tasks, sorted by stage wall contribution.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pydin_spark import get_session  # noqa: E402


def _stage_stats(event_dir: str) -> dict:
    """stage id -> {name, durations[], shuffle_read[], spill_mem,
    spill_disk} from every event log file under event_dir."""
    stages: dict = {}
    paths = []
    for root, _dirs, files in os.walk(event_dir):
        for fn in files:
            if fn.startswith(".") or fn.startswith("appstatus"):
                continue
            paths.append(os.path.join(root, fn))
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    st = stages.setdefault(
                        sid, {"durs": [], "shuf": [], "sm": 0, "sd": 0})
                    info = ev.get("Task Info", {})
                    st["durs"].append(
                        info.get("Finish Time", 0)
                        - info.get("Launch Time", 0))
                    m = ev.get("Task Metrics") or {}
                    sr = (m.get("Shuffle Read Metrics") or {})
                    st["shuf"].append(
                        sr.get("Remote Bytes Read", 0)
                        + sr.get("Local Bytes Read", 0))
                    st["sm"] += m.get("Memory Bytes Spilled", 0)
                    st["sd"] += m.get("Disk Bytes Spilled", 0)
                elif ev.get("Event") == "SparkListenerStageCompleted":
                    sid = ev["Stage Info"]["Stage ID"]
                    stages.setdefault(
                        sid, {"durs": [], "shuf": [], "sm": 0, "sd": 0})[
                        "name"] = ev["Stage Info"].get("Stage Name", "")
    return stages


def main() -> None:
    sf_dir = sys.argv[1]
    out_json = sys.argv[2]
    names = sys.argv[3:]
    mb = 1024 * 1024
    out: dict = {}
    for name in names:
        event_dir = tempfile.mkdtemp(prefix=f"pydin_ev_{name}_")
        spark = get_session(
            f"skew-probe-{name}",
            extra_conf={"spark.driver.memory": "32g",
                        "spark.eventLog.enabled": "true",
                        "spark.eventLog.compress": "false",
                        "spark.eventLog.rolling.enabled": "false",
                        "spark.eventLog.dir": f"file://{event_dir}"})
        qs = entrymod.queries()
        spark.sparkContext.setJobDescription(f"skew-probe:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        spark.stop()
        time.sleep(1)  # let the event log flush on stop
        stages = _stage_stats(event_dir)
        rows = []
        for sid, st in stages.items():
            durs = st["durs"]
            if len(durs) < 4:
                continue
            dmed = statistics.median(durs)
            smed = statistics.median(st["shuf"])
            rows.append({
                "stage": sid,
                "name": (st.get("name", "") or "")[:80],
                "tasks": len(durs),
                "dur_med_ms": round(dmed, 1),
                "dur_max_ms": max(durs),
                "dur_ratio": round(max(durs) / dmed, 2) if dmed else None,
                "shuf_read_med_mb": round(smed / mb, 2),
                "shuf_read_max_mb": round(max(st["shuf"]) / mb, 2),
                "shuf_read_ratio": (round(max(st["shuf"]) / smed, 2)
                                    if smed else None),
                "spill_mem_mb": round(st["sm"] / mb, 1),
                "spill_disk_mb": round(st["sd"] / mb, 1),
                "sum_dur_s": round(sum(durs) / 1000, 1),
            })
        rows.sort(key=lambda r: -r["sum_dur_s"])
        out[name] = {"wall_sec": wall, "stages": rows[:12]}
        print(f"# {name}: wall {wall}s, {len(rows)} stages >=4 tasks",
              file=sys.stderr)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
