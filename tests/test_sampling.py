"""Deterministic sampling ops vs a hashlib pure-Python twin, plus the
properties that justify them: run-to-run stability, salt independence,
and exact per-stratum quotas."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sagan_spark.ops.sampling import (
    deterministic_sample,
    frac_to_hex8,
    stratified_sample,
    train_holdout_split,
)


def _h8(salt: str, doc_id: int) -> str:
    return hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:8]


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (i, f"document number {i} body", "en" if i % 3 else "de")
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_deterministic_sample_vs_python(docs_df):
    got = {r.doc_id for r in deterministic_sample(docs_df, 0.3, salt="s").collect()}
    want = {i for i in range(300) if _h8("s", i) < frac_to_hex8(0.3)}
    assert got == want
    assert 0 < len(got) < 300
    # stable under re-execution and repartitioning
    again = {
        r.doc_id
        for r in deterministic_sample(docs_df.repartition(7), 0.3, salt="s").collect()
    }
    assert again == got


def test_different_salts_give_different_samples(docs_df):
    a = {r.doc_id for r in deterministic_sample(docs_df, 0.3, salt="a").collect()}
    b = {r.doc_id for r in deterministic_sample(docs_df, 0.3, salt="b").collect()}
    assert a != b


def test_train_holdout_split_vs_python(docs_df):
    got = {r.doc_id: r.split for r in train_holdout_split(docs_df, 0.2).collect()}
    assert len(got) == 300  # every doc labeled exactly once
    for i in range(300):
        want = "holdout" if _h8("split", i) < frac_to_hex8(0.2) else "train"
        assert got[i] == want


def test_stratified_sample_quotas_and_membership(docs_df):
    out = stratified_sample(docs_df, {"en": 40, "de": 15}).collect()
    by_lang: dict[str, list[int]] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert len(by_lang["en"]) == 40
    assert len(by_lang["de"]) == 15
    # membership = first-N ids in (hash, id) order per stratum
    for lang, quota in (("en", 40), ("de", 15)):
        ids = [i for i in range(300) if (("en" if i % 3 else "de") == lang)]
        want = sorted(ids, key=lambda i: (_h8("strata", i), i))[:quota]
        assert sorted(by_lang[lang]) == sorted(want)


def test_stratified_small_stratum_and_unquoted_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "en"), (3, "c", "fr")],
        "doc_id long, text string, lang string",
    )
    out = stratified_sample(docs, {"en": 10}).collect()
    assert {r.doc_id for r in out} == {1, 2}  # quota > size keeps all; fr dropped


def test_full_fraction_keeps_every_row(docs_df):
    """fraction >= 1.0 is exact keep-all: no hash filter at all (the
    clamped 'ffffffff' strict-< threshold would drop ~1-per-4.3B docs)."""
    assert deterministic_sample(docs_df, 1.0).count() == docs_df.count()
    split = train_holdout_split(docs_df, holdout_frac=1.0)
    assert split.filter(split.split == "train").count() == 0


def test_domain_quota_sample_vs_python(spark):
    """Per-domain cap vs a hashlib twin that replays the whole
    construction: over-cap detection, slack-rate pre-filter threshold
    (floor + lowercase hex), rank among survivors."""
    import math

    from sagan_spark.ops.sampling import domain_quota_sample

    # 3 domains: hot (60 docs), warm (12), cold (3); cap 5
    rows = []
    for i in range(75):
        dom = "hot.com" if i < 60 else ("warm.org" if i < 72 else "cold.net")
        rows.append((i, f"https://www.{dom}/p/{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    cap = 5
    got = {(r.doc_id, r.domain) for r in domain_quota_sample(docs, cap).collect()}

    # twin
    slack = float(cap + 6 * math.sqrt(cap) + 16)
    by_dom = {}
    for i, url in rows:
        dom = url.split("://www.")[1].split("/")[0]
        by_dom.setdefault(dom, []).append(i)
    want = set()
    for dom, ids in by_dom.items():
        if len(ids) <= cap:
            want.update((i, dom) for i in ids)
            continue
        if slack >= len(ids):
            t = "g"  # keep-all sentinel, > every hex hash
        else:
            t = format(int(math.floor((slack / len(ids)) * (1 << 32))), "x").zfill(8)
        surv = sorted(
            (( _h8("domq", i), i) for i in ids if _h8("domq", i) < t)
        )
        want.update((i, dom) for _, i in surv[:cap])
    assert got == want
    # the cap binds on the hot domain and only there
    per_dom = {}
    for i, dom in got:
        per_dom[dom] = per_dom.get(dom, 0) + 1
    assert per_dom["hot.com"] == cap
    assert per_dom["warm.org"] == cap
    assert per_dom["cold.net"] == 3


def test_domain_quota_sample_stability(spark):
    from sagan_spark.ops.sampling import domain_quota_sample

    rows = [(i, f"https://h{i % 4}.example.com/p/{i}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    a = {r.doc_id for r in domain_quota_sample(docs, 10).collect()}
    b = {r.doc_id for r in domain_quota_sample(docs.repartition(13), 10).collect()}
    assert a == b and len(a) == 10  # all hosts share example.com


def test_temperature_mix_vs_python(spark):
    """Membership == the hashlib/math twin computing the same
    integer-milli-weight rates and md5 hex thresholds."""
    import math

    from sagan_spark.ops.sampling import temperature_mix

    # skewed source sizes: 200 / 60 / 15 / 2 (the 2-doc source's rate
    # caps at 1.0 -> exercises the keep-all sentinel path)
    sizes = {"big": 200, "mid": 60, "small": 15, "tiny": 2}
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"text {i}", src))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    budget, alpha = 80, 0.5
    got = {(r.doc_id, r.source)
           for r in temperature_mix(docs, budget, alpha).collect()}

    def thresholds(sizes, budget, alpha):
        w = {s: math.floor(1000.0 * n ** alpha) for s, n in sizes.items()}
        z = sum(w.values())
        th = {}
        for s, n in sizes.items():
            if budget * w[s] >= z * n:
                th[s] = "g"
            else:
                th[s] = format(
                    math.floor(budget * 1.0 * w[s] / (z * 1.0 * n) * (1 << 32)),
                    "08x",
                )
        return th

    th = thresholds(sizes, budget, alpha)
    kept = {
        (doc_id, src) for doc_id, _t, src in rows
        if _h8("tmix", doc_id) < th[src]
    }
    assert got == kept
    assert th["tiny"] == "g"                      # capped source kept whole
    assert sum(1 for _d, s in kept if s == "tiny") == 2

    # partitioning invariance: same membership at a different layout
    got8 = {(r.doc_id, r.source)
            for r in temperature_mix(docs.repartition(8), budget, alpha).collect()}
    assert got8 == got


def test_temperature_mix_alpha_extremes(spark):
    """alpha=1 -> one uniform rate (proportional, exact integer
    weights); alpha=0 -> equal expected count per source."""
    import math

    from sagan_spark.ops.sampling import temperature_mix

    sizes = {"a": 120, "b": 30}
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string")

    def kept_for(budget, alpha):
        w = {s: math.floor(1000.0 * n ** alpha) for s, n in sizes.items()}
        z = sum(w.values())
        th = {
            s: "g" if budget * w[s] >= z * n
            else format(
                math.floor(budget * 1.0 * w[s] / (z * 1.0 * n) * (1 << 32)), "08x"
            )
            for s, n in sizes.items()
        }
        return {(d, s) for d, s in rows if _h8("tmix", d) < th[s]}

    # alpha=1: both sources sampled at the SAME rate budget/total
    got1 = {(r.doc_id, r.source)
            for r in temperature_mix(docs, 50, alpha=1.0).collect()}
    assert got1 == kept_for(50, 1.0)

    # alpha=0: rate_i = budget/k/n_i -> the small source's rate is 4x
    got0 = {(r.doc_id, r.source)
            for r in temperature_mix(docs, 50, alpha=0.0).collect()}
    assert got0 == kept_for(50, 0.0)


def test_temperature_mix_budget_zero_and_negative(spark):
    from sagan_spark.ops.sampling import temperature_mix

    docs = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    assert temperature_mix(docs, 0).count() == 0
    with pytest.raises(ValueError):
        temperature_mix(docs, -1)


def _py_water_fill(counts: dict, target: dict, budget: int):
    """Pure-Python twin of the mixture_quotas spec (sorted integer-key
    walk, prefix-consistent saturation, truncating division)."""
    rows = sorted(
        ((g, n, target[g]) for g, n in counts.items() if g in target),
        key=lambda t: ((t[1] * 1_000_000) // t[2], t[0]),
    )
    share_total = sum(s for _, _, s in rows)
    flags, cum, share_before, ok = {}, 0, 0, True
    for g, n, s in rows:
        share_after = share_total - share_before
        ok = ok and (n * share_after <= (budget - cum) * s)
        flags[g] = ok
        cum += n
        share_before += s
    r = budget - sum(n for g, n, _ in rows if flags[g])
    s_un = sum(s for g, _, s in rows if not flags[g])
    return {
        g: (n if flags[g] else min(n, (r * s) // s_un), flags[g])
        for g, n, s in rows
    }


def test_mixture_quotas_twin_and_branches(spark):
    """Water-filling allocation equals the Python twin on a corpus
    that exercises saturation, capping, untargeted-group drop, and a
    targeted-but-absent group; the allocation is budget-exact when
    any group saturates the walk."""
    from sagan_spark.ops.sampling import mixture_quotas

    counts = {"en": 500, "de": 60, "fr": 10, "xx": 5}
    rows, i = [], 0
    for g, n in counts.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    target = {"en": 500_000, "de": 300_000, "fr": 150_000, "ro": 50_000}
    want = _py_water_fill(counts, target, 200)
    got = {
        r.lang: (r.quota, r.saturated)
        for r in mixture_quotas(docs, target, 200).collect()
    }
    assert got == want
    assert "xx" not in got and "ro" not in got
    assert sum(q for q, _ in got.values()) <= 200


def test_mixture_quotas_budget_exceeds_corpus(spark):
    """budget >= total availability: every group saturates (keep all)."""
    from sagan_spark.ops.sampling import mixture_quotas

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, lang string"
    )
    got = {
        r.lang: (r.quota, r.saturated)
        for r in mixture_quotas(docs, {"a": 10, "b": 990}, 100).collect()
    }
    assert got == {"a": (2, True), "b": (1, True)}


def test_mixture_quotas_validation(spark):
    from sagan_spark.ops.sampling import mixture_quotas

    docs = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        mixture_quotas(docs, {"a": 1}, -1)
    with pytest.raises(ValueError):
        mixture_quotas(docs, {}, 10)
    with pytest.raises(ValueError):
        mixture_quotas(docs, {"a": 0}, 10)


def test_mixture_sample_counts_and_determinism(spark):
    """Selection hits the allocated quota exactly per group and is
    invariant under repartitioning (hash-order membership)."""
    from sagan_spark.ops.sampling import mixture_quotas, mixture_sample

    rows = [(i, "en" if i < 300 else "de") for i in range(360)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    target = {"en": 500_000, "de": 500_000}
    quotas = {
        r.lang: r.quota for r in mixture_quotas(docs, target, 100).collect()
    }
    sel = mixture_sample(docs, target, 100)
    counts = {r.lang: r.c for r in sel.groupBy("lang").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    assert counts == quotas
    again = mixture_sample(docs.repartition(17), target, 100)
    assert sorted(r.doc_id for r in sel.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mixture_budget_select_twin(spark):
    """Token-budget mixture fill equals the per-group prefix-rule twin
    (water-fill in token units, hash-order cumulative <= quota);
    invariant under repartitioning and cell width."""
    rows = [(i, "en" if i % 3 else "de", (i % 29) + 1) for i in range(400)]
    rows += [(1000, "en", 0), (1001, "xx", 5)]  # zero-token; untargeted
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    target = {"en": 700_000, "de": 300_000}
    budget = 1500
    from sagan_spark.ops.sampling import mixture_budget_select, mixture_quotas

    quota = {
        r.lang: r.quota
        for r in mixture_quotas(
            docs, target, budget, weight_col="n_tokens"
        ).collect()
    }
    # token-unit water-fill twin
    avail = {}
    for _, g, t in rows:
        if g in target:
            avail[g] = avail.get(g, 0) + t
    assert sum(quota.values()) <= budget
    assert set(quota) == set(avail)

    got = sorted(
        r.doc_id for r in mixture_budget_select(docs, target, budget).collect()
    )
    want = []
    for g in quota:
        grp = sorted(
            (
                (hashlib.md5(f"mixb|{i}".encode()).hexdigest()[:8], i, t)
                for i, gg, t in rows
                if gg == g
            ),
        )
        c = 0
        for _, i, t in grp:
            c += t
            if c <= quota[g]:
                want.append(i)
    assert got == sorted(want)
    assert 1001 not in got
    again = mixture_budget_select(docs.repartition(13), target, budget)
    assert sorted(r.doc_id for r in again.collect()) == got
    cells1 = mixture_budget_select(docs, target, budget, cell_chars=1)
    assert sorted(r.doc_id for r in cells1.collect()) == got


def test_mixture_budget_select_validation(spark):
    from sagan_spark.ops.sampling import mixture_budget_select, mixture_quotas

    docs = spark.createDataFrame(
        [(1, "a", 5)], "doc_id long, lang string, n_tokens long"
    )
    with pytest.raises(ValueError):
        mixture_budget_select(docs, {"a": 1}, -1)
    with pytest.raises(ValueError):
        mixture_budget_select(docs, {"a": 1}, 10, cell_chars=0)
    # NULL token fails loud inside the availability scan
    bad = spark.createDataFrame(
        [(1, "a", None)], "doc_id long, lang string, n_tokens long"
    )
    with pytest.raises(Exception, match="mixture_quotas"):
        mixture_quotas(bad, {"a": 1}, 10, weight_col="n_tokens").collect()
