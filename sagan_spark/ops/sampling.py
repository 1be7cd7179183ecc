"""Deterministic sampling / splitting operators for training-data
pipelines over the `documents` table.

All three operators key off ``md5(salt || doc_id)``: reproducible
across runs, engines, and cluster sizes (no RNG state, no
partition-order dependence — Spark's native ``sample()`` is neither
stable under repartitioning nor mirrorable in an external oracle).
Comparing the first 8 hex chars lexicographically equals comparing the
top 32 hash bits numerically, so thresholds are plain hex-string
literals and the DuckDB oracle is the byte-identical expression.

Scale notes (100 TB posture):
- :func:`deterministic_sample` / :func:`train_holdout_split` are pure
  scan-level projections — no shuffle, no state; Catalyst pushes the
  hash filter next to the scan.
- :func:`stratified_sample` / :func:`domain_quota_sample` bound their
  exact-rank windows with a slack-rate hash pre-filter, so a Zipf-hot
  stratum/domain never funnels the raw corpus into one sorting task —
  the window only ever sees ~quota + O(sqrt(quota)) rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash8(id_col, salt: str):
    """First 8 hex chars of md5(salt|id) — the deterministic sort/
    threshold key (lowercase hex; lexicographic == numeric on the top
    32 bits)."""
    return F.substring(F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, 8)


def frac_to_hex8(fraction: float) -> str:
    """Threshold literal: keep rows whose hash8 < this."""
    n = min(max(int(round(fraction * (1 << 32))), 0), (1 << 32) - 1)
    return format(n, "08x")


def _rate_to_hex_threshold(rate_col):
    """Column form of the hex-threshold spelling: floor(rate·2^32) as
    an 8-char lowercase hex literal.  floor() on BOTH contract sides
    (DuckDB CAST rounds, Spark CAST truncates — floor is the portable
    spelling); lower() because Spark's conv() emits UPPERCASE hex and
    md5() lowercase (lexicographic==numeric needs one case); callers
    must route rate >= 1 to the 'g' keep-all sentinel instead ('g' >
    'f' sorts above every hash — a 9-char '100000000' would sort BELOW
    any hash not starting with '0' and drop nearly everything)."""
    return F.lpad(
        F.lower(
            F.conv(
                F.floor(rate_col * F.lit(float(1 << 32))).cast("string"), 10, 16
            )
        ),
        8,
        "0",
    )


def deterministic_sample(docs: DataFrame, fraction: float,
                         id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — stable under
    re-runs, repartitioning, and engine changes; disjoint salts give
    independent samples."""
    if fraction >= 1.0:
        # no filter at all: the clamped 'ffffffff' threshold with a
        # strict < would drop ~1-per-4.3B docs whose top hash bits are
        # all ones — at multi-billion-doc scale "keep all" must be exact
        return docs
    return docs.filter(_hash8(F.col(id_col), salt) < F.lit(frac_to_hex8(fraction)))


def train_holdout_split(docs: DataFrame, holdout_frac: float = 0.1,
                        id_col: str = "doc_id", salt: str = "split") -> DataFrame:
    """Adds a ``split`` column ('holdout' for ~holdout_frac of ids,
    else 'train') — the deterministic train/eval partition of a corpus
    (same doc lands in the same split on every run and cluster)."""
    h = _hash8(F.col(id_col), salt)
    is_holdout = (
        F.lit(True)  # frac>=1: everything holds out (see deterministic_sample)
        if holdout_frac >= 1.0
        else h < F.lit(frac_to_hex8(holdout_frac))
    )
    return docs.withColumn(
        "split",
        F.when(is_holdout, F.lit("holdout")).otherwise(F.lit("train")),
    )


def _slack_capped_topn(joined: DataFrame, key_cols: list[str], quota,
                       id_col: str, salt: str) -> DataFrame:
    """The shared skew-safe core of both quota samplers: given a frame
    carrying the per-key size ``_sg_n`` (over-quota keys only), keep
    the hash-order top-``quota`` rows per key.

    1. scan-level hash-rate pre-filter at rate
       ``(q + 6*sqrt(q) + 16) / n`` — the slack term makes the binomial
       survivor count fall below ``q`` with probability < 1e-9 per key,
       and survivors are bounded (~q + O(sqrt(q))); the 'g' sentinel
       keeps ALL rows when slack >= size (possible for small quotas on
       a barely over-quota key).  Hash order is preserved, so the top-q
       survivors ARE the top-q of the full key whenever survivors >= q.
    2. the exact rank window then only ever sorts a few thousand rows
       per key regardless of corpus size (plan-pinned:
       ``test_quota_samplers_window_only_slack_survivors``).

    ``quota``: per-row Column (a literal for the constant-cap case —
    constant-folds to the same plan).  Leaves ``_sg_n`` on the output;
    drops the scratch ``_sg_h``/``_rn``."""
    q = quota.cast("double")
    slack = q + F.lit(6.0) * F.sqrt(q) + F.lit(16.0)
    thresh = F.when(slack >= F.col("_sg_n"), F.lit("g")).otherwise(
        _rate_to_hex_threshold(slack / F.col("_sg_n"))
    )
    survivors = joined.withColumn(
        "_sg_h", _hash8(F.col(id_col), salt)
    ).filter(F.col("_sg_h") < thresh)
    rn = F.row_number().over(
        Window.partitionBy(*key_cols).orderBy(
            F.col("_sg_h").asc(), F.col(id_col).asc()
        )
    )
    return (
        survivors.withColumn("_rn", rn)
        .filter(F.col("_rn") <= quota)
        .drop("_rn", "_sg_h")
    )


def domain_quota_sample(docs: DataFrame, cap: int, url_col: str = "url",
                        id_col: str = "doc_id",
                        salt: str = "domq") -> DataFrame:
    """At most ``cap`` documents per registered domain, chosen in
    deterministic hash order — the per-site quota pass a Common-Crawl
    curation pipeline runs so one hot domain (10^8+ pages) cannot
    dominate the corpus.

    This is the skew-safe composition the :func:`stratified_sample`
    docstring prescribes for Zipf-hot strata, packaged as one operator:

    1. per-domain sizes via a map-side-combining count (never a window
       over the raw corpus), immediately filtered to the OVER-CAP
       domains — the only ones that need any work.  At web scale that
       table is orders of magnitude smaller than the domain count
       (domains with > cap pages), so it broadcasts; under-cap rows
       take a map-side "keep" verdict and never touch a shuffle.
    2. over-cap rows pass a scan-level hash-rate pre-filter at rate
       ``(cap + 6*sqrt(cap) + 16) / size`` — the slack term makes the
       binomial survivor count fall below ``cap`` with probability
       < 1e-9 per domain, and survivors are bounded
       (~cap + O(sqrt(cap))), so
    3. the exact rank-within-domain window only ever sorts a few
       thousand rows per domain regardless of corpus size.

    Membership is reproducible across runs and cluster sizes (same
    md5 key discipline as the other samplers).  Returns the input rows
    plus a ``domain`` column.
    """
    from sagan_spark.ops.urltools import registered_domain, url_host

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    d = docs.withColumn(
        "_sg_domain", registered_domain(url_host(F.col(url_col)))
    )
    over = (
        d.groupBy("_sg_domain")
        .agg(F.count(F.lit(1)).alias("_sg_n"))
        .filter(F.col("_sg_n") > cap)
    )
    joined = d.join(F.broadcast(over), "_sg_domain", "left")
    under = joined.filter(F.col("_sg_n").isNull()).drop("_sg_n")
    capped = _slack_capped_topn(
        joined.filter(F.col("_sg_n").isNotNull()),
        ["_sg_domain"], F.lit(cap), id_col, salt,
    ).drop("_sg_n")
    return under.unionByName(capped).withColumnRenamed("_sg_domain", "domain")


def stratified_sample(docs: DataFrame, quotas: dict[str, int],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      salt: str = "strata") -> DataFrame:
    """Exactly ``quotas[stratum]`` rows per stratum (fewer when the
    stratum is smaller), chosen in deterministic hash order — per-
    language corpus balancing with reproducible membership.  Strata
    absent from ``quotas`` are dropped.

    Skew posture (the :func:`domain_quota_sample` composition — a
    Zipf-hot stratum must never funnel the raw corpus into one sorting
    task):

    1. per-stratum sizes via a map-side-combining count (tiny — one
       row per stratum), broadcast back;
    2. strata at-or-under quota keep ALL rows with a scan-level
       verdict — no shuffle, no window;
    3. over-quota strata pass a scan-level hash-rate pre-filter at
       rate ``(q + 6*sqrt(q) + 16) / n`` — survivors are
       ~q + O(sqrt(q)) per stratum regardless of corpus size, and the
       binomial survivor count falls below ``q`` with probability
       < 1e-9 per stratum (hash order is preserved, so the top-q
       survivors ARE the top-q of the full stratum whenever survivors
       >= q);
    4. the exact rank window then only ever sorts a few thousand rows
       per stratum.
    """
    quota = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )[F.col(strata_col)]
    counts = (
        docs.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_sg_n"))
        .select(strata_col, "_sg_n", quota.alias("_sg_q"))
        .filter(F.col("_sg_q").isNotNull() & (F.col("_sg_q") > 0))
    )
    joined = docs.join(F.broadcast(counts), strata_col)
    under = joined.filter(F.col("_sg_n") <= F.col("_sg_q")).drop("_sg_n", "_sg_q")
    capped = _slack_capped_topn(
        joined.filter(F.col("_sg_n") > F.col("_sg_q")),
        [strata_col], F.col("_sg_q"), id_col, salt,
    ).drop("_sg_n", "_sg_q")
    return under.unionByName(capped)


def mixture_quotas(docs: DataFrame, target: dict[str, int], budget: int,
                   group_col: str = "lang",
                   weight_col: str | None = None) -> DataFrame:
    """Availability-aware water-filling allocation: split a document
    ``budget`` across groups proportionally to ``target`` share
    weights, letting groups that cannot fill their share ("saturated":
    all their rows are taken) spill the surplus to the rest — the
    mixture-allocation step multi-source training recipes run before
    sampling (The Pile / LLaMA-class mixtures publish exactly such
    per-source weights; Gao et al. arXiv:2101.00027 §1 table 1,
    Touvron et al. arXiv:2302.13971 table 1.  With no saturation this
    is plain proportional allocation; saturation is the
    every-corpus-is-finite correction).

    Exact integer spec (bit-identical on both contract engines):
    groups sort by the integer key ``(n_avail·10^6) div share`` (the
    saturation order; ties broken by group name), and the classic
    water-filling walk becomes ONE cumulative window over that sorted
    frame — a group saturates iff
    ``n_avail·share_after <= (budget - cum_avail_before)·share``,
    i.e. its full availability fits inside its proportional slice of
    what the earlier-saturating groups left behind; the condition is
    monotone along the sort (prefix-min pins the maximal consistent
    prefix).  Unsaturated groups get
    ``quota = (R·share) div S`` with ``R`` the budget left after the
    saturated prefix and ``S`` the unsaturated share mass —
    truncation leaves at most one doc per unsaturated group
    unallocated (documented; callers wanting exact totals bump
    ``budget`` by ``len(target)``).

    100 TB shape: the corpus is touched by ONE map-side-combining
    count; every window runs over the per-group frame (one row per
    group in ``target`` — bounded by construction, broadcastable).
    Overflow posture: every product runs in DECIMAL(38,0)/HUGEINT;
    only the final quotients (sort key, quota — both <= budget-scale)
    must fit int64, and both engines run checked arithmetic, so an
    extreme ``n_avail/share`` ratio fails loud, never silently wraps.

    ``weight_col`` switches the allocation unit: by default a group's
    availability is its ROW count (quotas in documents); with
    ``weight_col`` it is the column's sum (quotas in tokens/bytes —
    the unit training budgets are actually written in).  NULL/negative
    weights fail loud inside the availability scan (a silent drop
    would mis-ration the budget).  All walk arithmetic runs through
    DECIMAL(38,0) products with integral `div` (Spark `div` on
    decimals returns the exact truncated quotient, same as DuckDB
    HUGEINT `//`), so token-scale budgets cannot overflow int64
    mid-product.

    Returns (group, n_avail, share, saturated, quota).  Groups absent
    from ``target`` are dropped; groups in ``target`` absent from the
    corpus allocate nothing (they have no rows to take).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if not target:
        raise ValueError("target must name at least one group")
    bad = {g: s for g, s in target.items() if s <= 0}
    if bad:
        raise ValueError(f"share weights must be positive, got {bad}")
    share = F.create_map(
        *[F.lit(x) for kv in target.items() for x in kv]
    )[F.col(group_col)].cast("long")
    if weight_col is None:
        avail = F.count(F.lit(1)).alias("n_avail")
    else:
        wc = F.col(weight_col).cast("long")
        checked = F.coalesce(
            F.when(wc >= 0, wc),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"mixture_quotas: NULL/negative {weight_col} in group "
                    ),
                    F.col(group_col).cast("string"),
                )
            ).cast("long"),
        )
        avail = F.sum(checked).alias("n_avail")
    w = (
        docs.groupBy(group_col)
        .agg(avail)
        .select(group_col, "n_avail", share.alias("share"))
        .filter(F.col("share").isNotNull())
        .withColumn(
            "_sg_key",
            F.expr("(cast(n_avail as decimal(38,0)) * 1000000) div share"),
        )
    )
    order = [F.col("_sg_key").asc(), F.col(group_col).asc()]
    before = (
        Window.partitionBy().orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    upto = (
        Window.partitionBy().orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy()
    zero = F.lit(0).cast("long")
    w = (
        w.withColumn(
            "_sg_cum_avail", F.coalesce(F.sum("n_avail").over(before), zero)
        )
        .withColumn(
            "_sg_share_after",
            F.sum("share").over(whole)
            - F.coalesce(F.sum("share").over(before), zero),
        )
        .withColumn(
            "_sg_cond",
            F.expr(
                "cast(n_avail as decimal(38,0)) * _sg_share_after"
                f" <= cast({int(budget)} - _sg_cum_avail as decimal(38,0))"
                " * share"
            ).cast("int"),
        )
        .withColumn("saturated", F.min("_sg_cond").over(upto) == 1)
    )
    r = F.lit(budget).cast("long") - F.sum(
        F.when(F.col("saturated"), F.col("n_avail")).otherwise(zero)
    ).over(whole)
    s = F.sum(
        F.when(~F.col("saturated"), F.col("share")).otherwise(zero)
    ).over(whole)
    # intermediate columns so the integer division stays `div`
    w = w.withColumn("_sg_r", r).withColumn("_sg_s", s)
    quota = F.when(F.col("saturated"), F.col("n_avail")).otherwise(
        F.least(
            F.col("n_avail"),
            F.expr("(cast(_sg_r as decimal(38,0)) * share) div _sg_s"),
        )
    )
    return w.select(
        group_col,
        "n_avail",
        "share",
        "saturated",
        quota.cast("long").alias("quota"),
    )


def mixture_sample(docs: DataFrame, target: dict[str, int], budget: int,
                   group_col: str = "lang", id_col: str = "doc_id",
                   salt: str = "mix") -> DataFrame:
    """Select the :func:`mixture_quotas` allocation: exactly ``quota``
    rows per group in deterministic hash order (the
    :func:`stratified_sample` membership discipline — reproducible
    across runs, engines, and cluster sizes).  Saturated groups keep
    everything with a scan-level verdict; over-quota groups go through
    the shared slack-prefiltered exact-rank core, so no window ever
    sees more than ~quota + O(sqrt(quota)) rows per group.  Groups
    with a zero quota are dropped."""
    quotas = mixture_quotas(docs, target, budget, group_col=group_col)
    q = quotas.select(
        group_col,
        F.col("n_avail").alias("_sg_n"),
        F.col("quota").alias("_sg_q"),
    )
    joined = docs.join(F.broadcast(q), group_col)
    under = joined.filter(F.col("_sg_n") <= F.col("_sg_q")).drop("_sg_n", "_sg_q")
    capped = _slack_capped_topn(
        joined.filter((F.col("_sg_n") > F.col("_sg_q")) & (F.col("_sg_q") > 0)),
        [group_col], F.col("_sg_q"), id_col, salt,
    ).drop("_sg_n", "_sg_q")
    return under.unionByName(capped)


def mixture_budget_select(docs: DataFrame, target: dict[str, int],
                          token_budget: int, group_col: str = "lang",
                          token_col: str = "n_tokens",
                          id_col: str = "doc_id", salt: str = "mixb",
                          cell_chars: int = 2) -> DataFrame:
    """Token-denominated mixture selection: water-fill the TOKEN
    budget across target shares (:func:`mixture_quotas` with
    ``weight_col``), then fill each group's token quota with documents
    in deterministic hash order — "give me 1T tokens at these source
    weights", the fixed-compute cut a training run actually orders
    (doc-count mixtures over-weight long-document groups;
    :func:`budget_select` fills ONE global budget by score — this is
    its per-group, share-aware sibling in hash order).

    Per-group strict fill (the budget_select rule): keep a doc iff
    the group's cumulative token count through it — in (md5 hash, id)
    order — stays <= its quota; a front-of-line giant selects nothing
    past it until smaller docs fit.  Zero-token docs at the boundary
    survive, matching the naive rule.

    Scale shape — budget_select's digit-decomposition, partitioned by
    group: per-(group, hash-cell) token-mass histogram (map-side
    combining; <= 16^cell_chars rows per group), ONE cumulative
    window per group over that bounded frame, verdicts broadcast
    back, and only each group's single boundary cell pays an exact
    within-cell window seeded with the pre-cell mass — no corpus-
    global sort, no per-group raw window; a Zipf-hot group's biggest
    sort task is one hash cell.  Provably identical to the per-group
    naive rule (the budget_select equivalence argument, per group),
    which is how the oracle replays it.

    Rows in untargeted groups drop; NULL/negative tokens fail loud.
    Returns the selected input rows.
    """
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    if not 1 <= cell_chars <= 8:
        raise ValueError(f"cell_chars must be in [1, 8], got {cell_chars}")
    quotas = mixture_quotas(
        docs, target, token_budget, group_col=group_col, weight_col=token_col
    )
    q = quotas.select(group_col, F.col("quota").alias("_sg_q"))
    tok = F.col(token_col).cast("long")
    checked = F.coalesce(
        F.when(tok >= 0, tok),
        F.raise_error(
            F.concat(
                F.lit(f"mixture_budget_select: NULL/negative {token_col}"
                      f" at {id_col}="),
                F.col(id_col).cast("string"),
            )
        ).cast("long"),
    )
    base = (
        docs.join(F.broadcast(q), group_col)
        .withColumn("_sg_h", _hash8(F.col(id_col), salt))
        .withColumn("_sg_cell", F.substring(F.col("_sg_h"), 1, cell_chars))
        .withColumn("_sg_tokc", checked)
    )
    cells = base.groupBy(group_col, "_sg_cell").agg(
        F.sum("_sg_tokc").alias("_sg_tok"),
        F.max("_sg_q").alias("_sg_q"),  # constant within the group
    )
    cum_before = F.coalesce(
        F.sum("_sg_tok").over(
            Window.partitionBy(group_col)
            .orderBy(F.col("_sg_cell").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    verdicts = cells.select(
        group_col,
        "_sg_cell",
        cum_before.alias("_sg_before"),
        (cum_before + F.col("_sg_tok")).alias("_sg_through"),
        "_sg_q",
    ).filter(F.col("_sg_before") <= F.col("_sg_q"))
    joined = base.drop("_sg_q").join(
        F.broadcast(verdicts), [group_col, "_sg_cell"], "inner"
    )
    kept_whole = joined.filter(F.col("_sg_through") <= F.col("_sg_q"))
    boundary = joined.filter(F.col("_sg_through") > F.col("_sg_q"))
    cum_doc = F.sum("_sg_tokc").over(
        Window.partitionBy(group_col, "_sg_cell")
        .orderBy(F.col("_sg_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary_kept = boundary.withColumn("_sg_cum", cum_doc).filter(
        F.col("_sg_before") + F.col("_sg_cum") <= F.col("_sg_q")
    ).drop("_sg_cum")
    drop = ["_sg_h", "_sg_cell", "_sg_tokc", "_sg_before", "_sg_through",
            "_sg_q"]
    return kept_whole.unionByName(boundary_kept).drop(*drop)


def temperature_mix(docs: DataFrame, budget: int, alpha: float = 0.5,
                    source_col: str = "source", id_col: str = "doc_id",
                    salt: str = "tmix") -> DataFrame:
    """Temperature-based corpus mixing: re-weight sources by
    ``n_i ** alpha`` and keep an expected ``budget`` documents total —
    the mixture-sampling pass multi-source training pipelines run so
    giant sources don't drown small ones (the p_i ∝ n_i^alpha rule of
    Brown et al. arXiv:2005.14165 §2.2 / Conneau & Lample
    arXiv:1901.07291 §3.1).  ``alpha=1`` is proportional sampling,
    ``alpha=0`` gives every source the same expected count, between
    flattens the mixture.

    Per-source keep rate ``min(1, budget * n_i^alpha / Z / n_i)`` with
    ``Z = Σ n_j^alpha``; membership is the same md5-threshold
    discipline as the other samplers (reproducible across runs,
    engines, cluster sizes).  The kept count is binomial around the
    expectation, NOT exact-rank (that's :func:`stratified_sample`) —
    the tradeoff buys a plan with no window: one map-side-combining
    count, one broadcast join, then a scan-level filter.  Sources
    whose rate caps at 1 contribute all their rows, so the realized
    total can undershoot ``budget``.  Rows with NULL ``source`` are
    dropped (inner join against the rate table).

    Numeric determinism: ``pow`` is the one non-correctly-rounded op
    in the chain, so each source's weight is quantized ONCE to an
    integer milli-weight ``w = floor(1000·n^alpha)`` and everything
    after is deterministic — ``Z = Σw`` is an exact integer sum (order
    independent), the keep-all test ``budget·w >= Z·n`` compares exact
    decimal(38) products, and the hex threshold is
    ``floor((budget·w)/(Z·n) · 2^32)`` over IEEE double ops that every
    engine rounds identically (long→double, ·, / are exactly rounded —
    unlike the earlier round-to-6-decimals rate, which manufactured
    cross-engine half-ties on rational rates).  A 1-ulp ``pow``
    divergence only matters if ``1000·n^alpha`` sits within 1 ulp of
    an integer (and is impossible for alpha ∈ {0, 1}, where the weight
    is exact)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("_sg_n"))
    n = F.col("_sg_n")
    w = F.floor(F.lit(1000.0) * F.pow(n.cast("double"), F.lit(alpha))).cast("long")
    # Z as a global window over the per-source count table (tiny —
    # one row per source) instead of a separate scalar aggregate: a
    # second consumer of `counts` would re-run the corpus-wide count
    # scan (no exchange reuse across the broadcast boundary)
    weights = counts.select(source_col, "_sg_n", w.alias("_sg_w"))
    z = F.sum("_sg_w").over(Window.partitionBy())
    dec = "decimal(38,0)"
    keep_all = (F.lit(budget).cast(dec) * F.col("_sg_w")) >= (
        z.cast(dec) * n
    )
    rate = (
        F.lit(float(budget))
        * F.col("_sg_w").cast("double")
        / (z.cast("double") * n.cast("double"))
    )
    rates = weights.select(
        source_col,
        F.when(keep_all, F.lit("g"))
        .otherwise(_rate_to_hex_threshold(rate))
        .alias("_sg_th"),
    )
    joined = docs.join(F.broadcast(rates), source_col)
    return joined.filter(_hash8(F.col(id_col), salt) < F.col("_sg_th")).drop("_sg_th")


def budget_select(docs: DataFrame, token_budget: int,
                  score_col: str = "score", token_col: str = "n_tokens",
                  id_col: str = "doc_id", salt: str = "budget",
                  cell_chars: int = 2) -> DataFrame:
    """Fill a token budget with the best-scoring documents — the
    "give me the top 1T tokens by quality" selection every
    fixed-compute training run starts from (dsir_select picks a DOC
    count; real budgets are in tokens).  Selection order is
    (score desc, md5-hash asc, id asc) — deterministic, reproducible
    across runs/engines/cluster sizes — and a document is kept iff the
    cumulative token count through it (in that order) is <= the
    budget (strict fill: the budget is never exceeded; a single
    over-budget giant at the front selects nothing before it).

    Scale shape (100 TB posture) — the naive spelling is a corpus-
    global ORDER BY score DESC with a running sum: one sorting task
    over everything, the exact anti-pattern this repo pins against.
    Instead the rank key is decomposed digit-by-digit:

    1. (score, hash-prefix cell) histogram: one map-side-combining
       aggregation; ``16^cell_chars`` cells per distinct score value.
    2. ONE cumulative window over that histogram (bounded by
       #distinct-scores x 256 rows with the default — never corpus
       size) yields per-cell verdicts: fully-kept / fully-dropped /
       THE single boundary cell where the budget runs out.
    3. verdicts broadcast back on (score, cell); only boundary-cell
       rows (an expected ``1/16^cell_chars`` of their score bucket —
       a tie-heavy score never funnels its whole bucket) pay the
       exact within-cell cumulative window, seeded with the exact
       token mass already consumed before the cell.

    Both windows sort composite-rank PREFIXES of the same total
    order, so the result is provably identical to the naive global
    window — which is exactly how the DuckDB oracle replays it.
    Rows with NULL score or NULL/negative tokens are rejected up
    front (fail-loud: a silent drop would mis-ration the budget)."""
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    if not 1 <= cell_chars <= 8:
        raise ValueError(f"cell_chars must be in [1, 8], got {cell_chars}")
    score, tok = F.col(score_col), F.col(token_col).cast("long")
    # fail-loud validation: evaluated inside the histogram aggregation,
    # which scans every input row before any pruning can skip one
    checked = F.coalesce(
        F.when(score.isNotNull() & (tok >= 0), tok),
        F.raise_error(
            F.concat(
                F.lit("budget_select: NULL score or NULL/negative "
                      f"{token_col} at {id_col}="),
                F.col(id_col).cast("string"),
            )
        ).cast("long"),
    )
    h = _hash8(F.col(id_col), salt)
    base = (
        docs.withColumn("_sg_h", h)
        .withColumn("_sg_cell", F.substring(F.col("_sg_h"), 1, cell_chars))
        .withColumn("_sg_tokc", checked)
    )
    cells = (
        base.groupBy(score_col, "_sg_cell")
        .agg(F.sum("_sg_tokc").alias("_sg_tok"))
    )
    cum_before = F.coalesce(
        F.sum("_sg_tok").over(
            Window.orderBy(score.desc(), F.col("_sg_cell").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    verdicts = cells.select(
        score_col,
        "_sg_cell",
        cum_before.alias("_sg_before"),
        (cum_before + F.col("_sg_tok")).alias("_sg_through"),
    ).filter(F.col("_sg_before") <= F.lit(token_budget))
    # fully-kept cells: whole cell fits; boundary cells: budget runs
    # out inside them.  <= (not <) so zero-token documents sitting
    # exactly AT the budget line (cum == budget) survive into the
    # refinement, as the naive rule keeps them; cells strictly past
    # the budget can never contribute (tokens >= 0 => cum monotone)
    joined = base.join(
        F.broadcast(verdicts), [score_col, "_sg_cell"], "inner"
    )
    kept_whole = joined.filter(F.col("_sg_through") <= F.lit(token_budget))
    boundary = joined.filter(F.col("_sg_through") > F.lit(token_budget))
    cum_doc = F.sum("_sg_tokc").over(
        Window.partitionBy(score_col, "_sg_cell")
        .orderBy(F.col("_sg_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary_kept = boundary.withColumn("_sg_cum", cum_doc).filter(
        F.col("_sg_before") + F.col("_sg_cum") <= F.lit(token_budget)
    ).drop("_sg_cum")
    drop = ["_sg_h", "_sg_cell", "_sg_tokc", "_sg_before", "_sg_through"]
    return kept_whole.unionByName(boundary_kept).drop(*drop)
