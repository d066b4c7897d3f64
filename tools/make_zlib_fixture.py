"""Build the committed zlib-DEFLATE oracle fixture for
``text_compression_ratio`` (VERDICT r6 item 3).

DuckDB ships no zlib scalar, so the gate's oracle cannot recompute
DEFLATE — instead it joins a COMMITTED fixture of precomputed
(text_md5, n_bytes, n_compressed) rows, keyed by the md5 of the
document text so the same fixture serves every scale factor whose
documents it covers (the join key is content, not doc_id; a driver
run at an uncovered sf drops rows and fails LOUDLY on rowcount
instead of silently passing). The compressor of record is CPython's
stdlib ``zlib.compress(text.encode("utf-8"), 6)`` — the identical
call the Spark operator makes per Arrow batch, so a hash match in the
gate is a genuine end-to-end value verification, upgrading the
inventory's one rows-only entry to the hash-exact class.

Usage: python tools/make_zlib_fixture.py [out.parquet] [sf_dir ...]
Defaults: fixtures/zlib_l6_ratio.parquet over sf0.001/sf0.01/sf0.1.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

LEVEL = 6


def rows_for(sf_dir: str):
    tab = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["text"])
    for text in tab.column("text").to_pylist():
        s = text if text is not None else ""
        key = hashlib.md5(s.encode("utf-8")).hexdigest()
        if s == "":
            yield key, 0, 0
        else:
            raw = s.encode("utf-8")
            yield key, len(raw), len(zlib.compress(raw, LEVEL))


def main():
    args = sys.argv[1:]
    out = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "zlib_l6_ratio.parquet")
    sf_dirs = args[1:] or ["/root/testdata/sf0.001",
                           "/root/testdata/sf0.01",
                           "/root/testdata/sf0.1"]
    seen: dict[str, tuple[int, int]] = {}
    for sf_dir in sf_dirs:
        for key, nb, nc in rows_for(sf_dir):
            prev = seen.setdefault(key, (nb, nc))
            assert prev == (nb, nc), f"md5 collision at {key}"
    keys = sorted(seen)
    table = pa.table({
        "text_md5": pa.array(keys, pa.string()),
        "n_bytes": pa.array([seen[k][0] for k in keys], pa.int64()),
        "n_compressed": pa.array([seen[k][1] for k in keys],
                                 pa.int64()),
    })
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out, compression="zstd")
    print(f"{out}: {table.num_rows} distinct texts from {sf_dirs}")


if __name__ == "__main__":
    main()
