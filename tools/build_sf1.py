"""Build a ~sf1 replica: every sf0.1 table replicated 10x into /tmp.

Replication semantics (what "10x more data" should mean per table):

- facts (lineitem/orders/events): keys shifted per replica so joins and
  group-bys see real cardinality growth, not 10 copies of one key space.
  Event timestamps are kept — 10x events per bucket is exactly the
  density a bigger deployment produces.
- documents: replica r rewrites the TEXT deterministically (vowel
  permutation r mod 10 × word rotation r div 10 — 100 distinct
  transforms at factor 100) so replicas are near-dup-disjoint from
  each other ACROSS decades too — corpus growth adds new content;
  verbatim copies of every doc would quadratically inflate pair
  counts and measure a different (adversarial) workload.
  Within-replica near-dup structure is preserved exactly.
- embeddings: vectors circular-shifted per replica (norm-preserving,
  direction-changing), negated on the second lap past r = dim —
  new points, same distribution shape, at factor 100 as well.
- dimensions (region/nation/customer/supplier/part): NOT scaled.
  Dimensions grow much slower than facts in any real warehouse, and
  keeping them broadcast-sized is the scenario the engine's plans are
  designed for.

Usage: python tools/build_sf1.py [src_dir] [out_dir] [factor] [tables]
(``tables`` = optional comma list to rebuild a subset in place, e.g.
``documents,embeddings`` after a transform change.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydin_spark import TPCH_TABLES, get_session, load_table  # noqa: E402

VOWELS = "aeiou"
#: distinct vowel permutations per replica (r=0 is identity)
PERMS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
         "eauoi", "ieuoa", "oeuai", "ueoia", "aiueo"]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    def wanted(*names):
        return only is None or bool(only & set(names))

    spark = get_session("build-sf1")
    os.makedirs(out, exist_ok=True)

    copy_only = ("region", "nation", "customer", "supplier", "part")
    for t in copy_only:
        if not wanted(t):
            continue
        load_table(spark, src, t).write.mode("overwrite") \
            .parquet(f"{out}/{t}.parquet")
        print(f"copied dim {t}")

    def shifted(df, col, shift):
        return df.withColumn(col, F.col(col) + F.lit(shift))

    if wanted("orders", "lineitem"):
        orders = load_table(spark, src, "orders")
        li = load_table(spark, src, "lineitem")
        okey_span = orders.agg(F.max("o_orderkey")).first()[0] + 1
        parts_o, parts_l = [], []
        for r in range(factor):
            parts_o.append(shifted(orders, "o_orderkey", r * okey_span))
            parts_l.append(shifted(li, "l_orderkey", r * okey_span))
        big_o = parts_o[0]
        for p in parts_o[1:]:
            big_o = big_o.unionByName(p)
        big_l = parts_l[0]
        for p in parts_l[1:]:
            big_l = big_l.unionByName(p)
        big_o.write.mode("overwrite").parquet(f"{out}/orders.parquet")
        big_l.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
        print(f"orders x{factor}: {big_o.count()}, "
              f"lineitem: {big_l.count()}")

    if wanted("events"):
        ev = load_table(spark, src, "events")
        ekey_span = ev.agg(F.max("event_id")).first()[0] + 1
        ukey_span = ev.agg(F.max("user_id")).first()[0] + 1
        parts = []
        for r in range(factor):
            parts.append(
                ev.withColumn("event_id",
                              F.col("event_id") + F.lit(r * ekey_span))
                  .withColumn("user_id",
                              F.col("user_id") + F.lit(r * ukey_span)))
        big_e = parts[0]
        for p in parts[1:]:
            big_e = big_e.unionByName(p)
        big_e.write.mode("overwrite").parquet(f"{out}/events.parquet")
        print(f"events x{factor}: {big_e.count()}")

    if wanted("documents"):
        docs = load_table(spark, src, "documents")
        dkey_span = docs.agg(F.max("doc_id")).first()[0] + 1
        parts = []
        for r in range(factor):
            p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * dkey_span))
            if r:
                # replica transform = vowel permutation (r mod 10) ×
                # word rotation (r div 10): every replica pair differs in
                # the permutation (different shingle CONTENT) or the
                # rotation (different shingle COMPOSITION — a k-gram
                # shingle is a word window, so rotating the word order
                # rewrites nearly every shingle). 100 distinct transforms
                # at factor 100 → replicas are near-dup-disjoint ACROSS
                # decades too, so the dedup/ANN families measure corpus
                # growth, not an adversarial duplicate workload (the old
                # suffix-token scheme left decades near-dup-identical).
                # Within-replica near-dup structure is preserved exactly
                # (the same transform applies to both halves of a pair).
                p = p.withColumn("text", F.translate(
                    "text", VOWELS, PERMS[r % len(PERMS)]))
                m = r // len(PERMS)
                if m:
                    w = F.split(F.col("text"), " ")
                    rotated = F.concat(
                        F.slice(w, m + 1, F.size(w) - F.lit(m)),
                        F.slice(w, 1, m))
                    p = p.withColumn(
                        "text",
                        F.when(F.size(w) > m,
                               F.array_join(rotated, " "))
                        .otherwise(F.concat("text", F.lit(f" zrep{r}"))))
            parts.append(p)
        big_d = parts[0]
        for p in parts[1:]:
            big_d = big_d.unionByName(p)
        big_d.write.mode("overwrite").parquet(f"{out}/documents.parquet")
        print(f"documents x{factor}: {big_d.count()}")

    if wanted("embeddings"):
        emb = load_table(spark, src, "embeddings")
        vkey_span = emb.agg(F.max("vec_id")).first()[0] + 1
        dim = len(emb.select("embedding").first()[0])
        parts = []
        for r in range(factor):
            p = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * vkey_span))
            if r % dim:
                rr = r % dim
                rot = F.concat(F.slice("embedding", rr + 1, dim - rr),
                               F.slice("embedding", 1, rr))
                p = p.withColumn("embedding", rot)
            if r >= dim:
                # rotations repeat past r = dim; NEGATE the vector for
                # the second lap (norm-preserving, cosine −1 to its
                # un-negated twin — a genuinely new direction, where the
                # old epsilon nudge left near-identical twins that made
                # ANN at factor > dim an adversarial duplicate workload).
                # rotation × sign gives 2·dim distinct transforms.
                p = p.withColumn(
                    "embedding",
                    F.transform("embedding", lambda v: -v))
            parts.append(p)
        big_v = parts[0]
        for p in parts[1:]:
            big_v = big_v.unionByName(p)
        big_v.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
        print(f"embeddings x{factor}: {big_v.count()}")
    print(f"done: {out}")


if __name__ == "__main__":
    main()
