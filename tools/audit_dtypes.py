"""Audit pandas-dtype parity between Spark results and DuckDB oracles.

The driver's correctness gate hashes values after converting both
sides to a tabular form; a DuckDB column typed HUGEINT (any SUM over
integers) or DECIMAL round-trips through pandas as float64/object and
hashes differently from Spark's int64 even when the values are equal.
The local gate's ``fetchall()`` path coerces HUGEINT to Python int and
hides the class — CORRECTNESS_r03's single red row
(``curation_token_budget``) was exactly this.

This tool runs every declared oracle and flags any column whose
DuckDB-reported type can change representation through pandas, plus
any column whose pandas dtype differs between the two engines.

Usage: python tools/audit_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pydin_spark import TPCH_TABLES, get_session  # noqa: E402

RISKY = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_session("dtype-audit")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    flagged = []
    for name in queries:
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            res = con.execute(oracles[name])
            d_types = {d[0]: str(d[1]) for d in res.description}
            d_pd = res.df().dtypes.astype(str).to_dict()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: duckdb: {exc}")
            flagged.append(name)
            continue
        try:
            s_pd = (queries[name](spark, sf_dir)
                    .limit(200).toPandas().dtypes.astype(str).to_dict())
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: spark: {exc}")
            flagged.append(name)
            continue
        probs = []
        for c, t in d_types.items():
            if any(r in t.upper() for r in RISKY):
                probs.append(f"{c}: duckdb {t}")
        for c in d_pd:
            if c in s_pd and d_pd[c] != s_pd[c]:
                # int64 vs float64 / object mismatches change the
                # stringified value ("1" vs "1.0"); flag them all and
                # eyeball the benign ones (e.g. datetime units).
                probs.append(f"{c}: pandas spark={s_pd[c]} duck={d_pd[c]}")
        if probs:
            print(f"FLAG  {name}: " + "; ".join(probs))
            flagged.append(name)
        else:
            print(f"ok    {name}")
    print(f"\n{len(flagged)} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
