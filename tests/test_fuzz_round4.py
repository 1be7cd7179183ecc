"""Seeded randomized equivalence for the round-4-continuation kernels
with nontrivial arithmetic: water-filling allocation, both as-of join
shapes, and the rollup cascade — each against a pure-Python twin over
corpora a hand case would not reach (random saturation mixes, tie
storms, cross-bucket carries, pre-1970 timestamps).  Deterministic
seeds (not hypothesis) so each property is a bounded number of Spark
jobs; the per-case twin is exact, so any divergence fails loudly."""

from __future__ import annotations

import datetime as dt
import random

US = 1_000_000


def _py_water_fill(counts, target, budget):
    rows = sorted(
        ((g, n, target[g]) for g, n in counts.items() if g in target and n),
        key=lambda t: ((t[1] * 1_000_000) // t[2], t[0]),
    )
    share_total = sum(s for _, _, s in rows)
    flags, cum, sb, ok = {}, 0, 0, True
    for g, n, s in rows:
        ok = ok and (n * (share_total - sb) <= (budget - cum) * s)
        flags[g] = ok
        cum += n
        sb += s
    r = budget - sum(n for g, n, _ in rows if flags[g])
    s_un = sum(s for g, _, s in rows if not flags[g])
    return {
        g: (n if flags[g] else min(n, (r * s) // s_un))
        for g, n, s in rows
    }


def test_fuzz_mixture_quotas(spark):
    from sagan_spark.ops.sampling import mixture_quotas

    rng = random.Random(2026)
    for case in range(10):
        groups = [f"g{i}" for i in range(rng.randint(1, 6))]
        counts = {g: rng.randint(0, 400) for g in groups}
        target = {g: rng.choice([1, 7, 100, 5000, 10**6]) for g in groups}
        if rng.random() < 0.5:
            target["ghost"] = 1000  # targeted but absent
        budget = rng.choice([0, 1, 37, 500, 10**6])
        rows, i = [], 0
        for g, n in counts.items():
            for _ in range(n):
                rows.append((i, g))
                i += 1
        if not rows:
            continue
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        got = {
            r.lang: r.quota
            for r in mixture_quotas(docs, target, budget).collect()
        }
        want = _py_water_fill(counts, target, budget)
        assert got == want, (case, counts, target, budget)
        assert sum(got.values()) <= budget


def _py_asof(left, right, max_age_us=None):
    out = []
    for eid, k, us in left:
        best = None
        if us is not None:
            cands = [
                (rus, p) for rk, rus, p in right
                if rk == k and rus <= us
                and (max_age_us is None or us - rus <= max_age_us)
            ]
            best = max(cands) if cands else None
        out.append((eid, best[0] if best else None,
                    best[1] if best else None))
    return sorted(out)


def test_fuzz_asof_both_shapes(spark):
    from sagan_spark.ops.asof import asof_join, asof_join_compact

    rng = random.Random(4)
    base = dt.datetime(2026, 1, 1)
    for case in range(5):
        n_keys = rng.randint(1, 4)
        left = [
            (i, rng.randrange(n_keys),
             None if rng.random() < 0.1
             else rng.randrange(0, 40 * 86400) * US)
            for i in range(rng.randint(1, 40))
        ]
        right = [
            (rng.randrange(n_keys + 1),  # one key left never uses
             rng.randrange(0, 40 * 86400) * US,
             f"p{rng.randrange(5)}")
            for _ in range(rng.randint(0, 25))
        ]
        l = spark.createDataFrame(
            [(i, k, None if us is None else base + dt.timedelta(microseconds=us))
             for i, k, us in left],
            "event_id long, user_id long, ts timestamp",
        )
        r = spark.createDataFrame(
            [(k, base + dt.timedelta(microseconds=us), p)
             for k, us, p in right],
            "user_id long, ts timestamp, snapshot string",
        )
        base_us = int(base.timestamp() * US)
        want = _py_asof(
            [(i, k, None if us is None else base_us + us) for i, k, us in left],
            [(k, base_us + us, p) for k, us, p in right],
        )
        for fn, kw in (
            (asof_join_compact, {}),
            (asof_join, {"bucket_sec": 86400}),
            (asof_join, {"bucket_sec": 7 * 86400}),
        ):
            got = sorted(
                (x.event_id, x.right_ts_us, x.snapshot)
                for x in fn(l, r, **kw).collect()
            )
            assert got == want, (case, fn.__name__, kw)


def test_fuzz_rollup_including_pre_1970(spark):
    from sagan_spark.ops.rollup import time_rollup

    rng = random.Random(7)
    rows = []
    for i in range(300):
        # span 1968..2026: negative epochs exercise the truncation
        # (toward zero, both engines) contract
        sec = rng.randrange(-2 * 366 * 86400, 86400 * 30)
        rows.append(
            (i, rng.choice(["a", "b"]),
             dt.datetime(1970, 1, 1) + dt.timedelta(seconds=sec),
             rng.uniform(-5, 5))
        )
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    got = sorted(
        (r.resolution_sec, r.key, r.bucket_us, r.n_events, r.sum_milli,
         r.min_milli, r.max_milli)
        for r in time_rollup(ev, resolutions=(60, 3600)).collect()
    )
    import math
    from collections import defaultdict

    want = []
    for res in (60, 3600):
        agg, cnt = defaultdict(list), defaultdict(int)
        for _, k, ts, v in rows:
            us = int(ts.timestamp() * US)
            b = int(us / (res * US))  # trunc toward zero
            bu = b * res * US
            cnt[(k, bu)] += 1
            agg[(k, bu)].append(math.floor(v * 1000))
        for (k, bu), n in cnt.items():
            ms = agg[(k, bu)]
            want.append((res, k, bu, n, sum(ms), min(ms), max(ms)))
    assert got == sorted(want)
