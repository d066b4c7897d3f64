"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column-name set, and order-insensitive values
(columns sorted by name, rows sorted, exact equality; floats compared
bit-exact first, then at 1e-9 relative as a diagnostic).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pydin_spark import TPCH_TABLES, get_session  # noqa: E402


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def values_close(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-12):
                    continue
            return False
    return True


def main():
    # optional: --json PATH writes a machine-readable artifact of this
    # run (feeds tools/freshness.py's staleness accounting — a full
    # local run is verification evidence on par with a driver window)
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_session("correctness", extra_conf={
        "spark.driver.memory": "16g"})
    con = duck_connection(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    results: dict[str, str] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            results[name] = "fail"
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            results[name] = "rows"
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            results[name] = "fail"
            continue
        status = []
        if len(s_rows) != len(d_rows):
            status.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            status.append(f"cols {sorted(s_cols)} != {sorted(d_cols)}")
        if not status:
            a, b = canon(s_rows, s_cols), canon(d_rows, d_cols)
            if a == b:
                pass
            elif values_close(a, b):
                status.append("values differ at <1e-9 (hash would MISMATCH)")
                for ra, rb in zip(a, b):
                    if ra != rb:
                        status.append(f"  first diff: {ra} vs {rb}")
                        break
            else:
                status.append("values differ")
                for ra, rb in zip(a, b):
                    if ra != rb:
                        status.append(f"  first diff: {ra!r} vs {rb!r}")
                        break
        if status:
            print(f"FAIL  {name}: " + "; ".join(status))
            failures.append(name)
            results[name] = "fail"
        else:
            print(f"OK    {name}: {len(s_rows)} rows exact-match "
                  f"[{time.time()-t0:.1f}s]")
            results[name] = "ok"
    if json_path:
        import json as _json
        artifact = {"sf_dir": sf_dir,
                    "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                    "results": results}
        # subset runs MERGE into an existing artifact (same contract
        # as scale_bench) — a full run still replaces every entry
        if only and os.path.exists(json_path):
            with open(json_path) as f:
                prev = _json.load(f)
            prev["results"].update(results)
            prev["ts"] = artifact["ts"]
            artifact = prev
        with open(json_path, "w") as f:
            _json.dump(artifact, f, indent=1)
    print(f"\n{len(failures)} failures" + (": " + ", ".join(failures)
                                           if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
