"""Property-based tests (hypothesis) for the pure-Python kernels: cron
matcher algebra and calendar period invariants."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from pydin_spark.calendar import Day, Hour, Month, Year
from pydin_spark.scheduler import matches

units = st.integers(min_value=0, max_value=366)


@given(lo=units, hi=units, u=units)
def test_range_matches_iff_in_range(lo, hi, u):
    assert matches(f"{lo}-{hi}", u) is (lo <= u <= hi)


@given(n=st.integers(min_value=1, max_value=60), u=units)
def test_cycle_matches_iff_divisible(n, u):
    assert matches(f"/{n}", u) is (u % n == 0)


@given(n=units, u=units)
def test_floor_matches_iff_ge(n, u):
    assert matches(f"{n}+", u) is (u >= n)


@given(vals=st.lists(units, min_size=2, max_size=6), u=units)
def test_list_matches_iff_member(vals, u):
    period = ",".join(map(str, vals))
    assert matches(period, u) is (u in vals)


@given(u=units)
def test_star_and_none_always_match(u):
    assert matches("*", u) and matches(None, u)


moments = st.datetimes(min_value=dt.datetime(1980, 1, 2),
                       max_value=dt.datetime(2099, 12, 30))


@settings(max_examples=200)
@given(now=moments)
def test_period_bounds_contain_moment(now):
    for cls in (Day, Hour, Month, Year):
        p = cls(now)
        assert p.start <= now.replace(microsecond=0) <= p.end
        assert p.start <= p.end


@given(now=moments, k=st.integers(min_value=0, max_value=48))
def test_months_back_lands_on_month_start(now, k):
    m = Day(now).months_back(k)
    assert m.start.day == 1
    assert m.start.hour == 0


@given(now=moments, k=st.integers(min_value=0, max_value=1000))
def test_days_back_is_exact_delta(now, k):
    d = Day(now).days_back(k)
    assert (now.replace(microsecond=0) - d.now) == dt.timedelta(days=k)


@given(now=moments)
def test_day_window_is_86399_seconds(now):
    d = Day(now)
    assert (d.end - d.start) == dt.timedelta(hours=23, minutes=59,
                                             seconds=59)


def test_sample_monotone_in_fraction(spark, views):
    """Hash sampling is monotone: the 30% sample is a subset of the 60%
    sample at the same seed (the hash unit is fixed per id), so growing
    a corpus sample never resamples — the resumability property."""
    from pydin_spark.operators import curation
    docs = spark.table("documents")
    small = {r[0] for r in curation.sample_stratified(
        docs, fraction=0.3, seed=11).select("doc_id").collect()}
    large = {r[0] for r in curation.sample_stratified(
        docs, fraction=0.6, seed=11).select("doc_id").collect()}
    assert small <= large
    assert len(small) < len(large)


def test_pack_sequences_random_token_counts(spark):
    """Packing invariants hold for arbitrary token-count tables: offsets
    are the exact running sum in id order regardless of partitioning."""
    import random
    rng = random.Random(5)
    rows = [(i, rng.randint(1, 300)) for i in range(257)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long") \
        .repartition(13)   # scramble physical layout on purpose
    from pydin_spark.operators import curation
    out = curation.pack_sequences(df, capacity=128, token_col="n_tokens")
    got = sorted((r["doc_id"], r["n_tokens"], r["start_offset"],
                  r["bin_id"]) for r in out.collect())
    run = 0
    for doc_id, n, start, bin_id in got:
        assert start == run and bin_id == start // 128
        run += n
    assert len(got) == 257


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    """Pointer-jumping components must agree with a driver-side
    union-find on arbitrary random graphs (self-loops dropped)."""
    from pydin_spark.operators.dedup import connected_components
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or None,
        "id_a long, id_b long") if edges else None
    if pairs is None:
        return
    got = {r["doc_id"]: r["component"]
           for r in connected_components(pairs).collect()}
    # reference union-find
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for a, b in edges if a != b for n in (a, b)}
    want = {n: find(n) for n in nodes}
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(0, 12), min_size=1, max_size=120),
       st.integers(min_value=2, max_value=16))
def test_heavy_hitters_bounds_hold(spark, items, capacity):
    """Misra-Gries contract on arbitrary streams and capacities:
    est <= true <= est + err_ub for every reported item, and in the
    exact regime (capacity >= distinct) counts are exact with zero
    error."""
    from collections import Counter

    from pydin_spark.operators.rollup import heavy_hitters
    df = spark.createDataFrame([(x,) for x in items], "v long") \
        .repartition(3)  # force multi-partition merge
    got = heavy_hitters(df, "v", k=20, capacity=capacity).collect()
    true = Counter(str(x) for x in items)
    for r in got:
        assert r.est_count <= true.get(r.item, 0) <= \
            r.est_count + r.err_ub, (r.item, r.est_count, r.err_ub)
    if capacity >= len(true):
        assert {r.item: r.est_count for r in got} == dict(
            Counter(true).most_common(20))
        assert all(r.err_ub == 0 for r in got)


ev_entries = st.lists(
    st.tuples(st.integers(min_value=1, max_value=4),      # user
              st.integers(min_value=0, max_value=50),     # minute
              st.sampled_from(["view", "click", "buy", "other"])),
    min_size=0, max_size=25)


@settings(max_examples=12, deadline=None)
@given(entries=ev_entries)
def test_funnel_matches_reference(spark, entries):
    """funnel() == a direct per-user reference walk for arbitrary tiny
    event logs (first-completion, strictly-after chaining)."""
    from pyspark.sql import functions as F
    from pydin_spark.operators.relational import funnel
    rows = [(i, u, f"2024-01-01 00:{m:02d}:00", t)
            for i, (u, m, t) in enumerate(entries)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    steps = ["view", "click", "buy"]
    got = {r.step: r.n_users for r in funnel(ev, steps).collect()}

    # reference: chaining is on TIMES (strictly greater), matching the
    # operator's ts-only comparison — same-timestamp events don't chain
    per_user = {}
    for (u, m, t) in entries:
        per_user.setdefault(u, []).append((m, t))
    want = {s: 0 for s in steps}
    for events_u in per_user.values():
        prev_m = None
        for s in steps:
            times = [m for (m, t) in events_u
                     if t == s and (prev_m is None or m > prev_m)]
            if not times:
                break
            prev_m = min(times)
            want[s] += 1
    assert got == want


edge_lists = st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                      min_size=1, max_size=50)


@settings(max_examples=12, deadline=None)
@given(edge_lists)
def test_triangles_match_bruteforce(spark, edges):
    """Degree-ordered wedge census must agree with a driver-side
    brute-force triangle count on arbitrary random graphs (self-loops
    and duplicate/reversed edges canonicalized away)."""
    from itertools import combinations

    from pydin_spark.operators.graph import triangles
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["deg"], r["tri_cnt"])
           for r in triangles(df).collect()}
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                tri[n] += 1
    want = {n: (len(adj[n]), tri[n]) for n in adj}
    assert got == want


@settings(max_examples=12, deadline=None)
@given(edge_lists, st.integers(min_value=1, max_value=4))
def test_kcore_converged_matches_bruteforce(spark, edges, k):
    """With enough rounds the synchronous peel equals the true k-core
    (iterated brute-force peel to fixpoint) on arbitrary graphs; node
    count bounds the rounds any peel can need."""
    from pydin_spark.operators.graph import kcore
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["core_deg"]
           for r in kcore(df, k=k, rounds=22).collect()}
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        drop = {n for n, nb in adj.items() if len(nb) < k}
        if not drop:
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    want = {n: len(nb) for n, nb in adj.items()}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(edge_lists, st.integers(min_value=1, max_value=4))
def test_hits_mass_and_role_invariants(spark, edges, iters):
    """HITS invariants on arbitrary graphs: scores non-negative, each
    column's mass bounded by SCALE (floor leakage only), pure sources
    carry zero authority and pure sinks zero hub."""
    from pydin_spark.operators.graph import HITS_SCALE, hits
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = hits(df, iterations=iters).collect()
    if not rows:
        return
    assert all(r["auth_fp"] >= 0 and r["hub_fp"] >= 0 for r in rows)
    assert sum(r["auth_fp"] for r in rows) <= HITS_SCALE
    assert sum(r["hub_fp"] for r in rows) <= HITS_SCALE
    srcs = {a for a, b in edges}
    dsts = {b for a, b in edges}
    for r in rows:
        if r["node"] not in dsts:
            assert r["auth_fp"] == 0
        if r["node"] not in srcs:
            assert r["hub_fp"] == 0
