"""Link-graph ops: href extraction vs re.findall, deterministic
integer PageRank vs a pure-Python twin (exact equality — the whole
point of the integer formulation), dangling/hub topology properties,
and domain-edge collapsing."""

from __future__ import annotations

import re

import pytest

from sagan_spark.ops.linkgraph import (
    HREF_RE,
    domain_edges,
    extract_links,
    pagerank,
)


def _twin_pagerank(edges, iterations=5, damping_milli=850, scale=1_000_000):
    """Same integer recurrence in plain Python dicts."""
    outdeg: dict = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    base = (1000 - damping_milli) * scale // 1000
    ranks = {n: scale for n in nodes}
    for _ in range(iterations):
        s_in: dict = {}
        for s, d in edges:
            s_in[d] = s_in.get(d, 0) + ranks[s] // outdeg[s]
        ranks = {n: base + (damping_milli * s_in.get(n, 0)) // 1000 for n in nodes}
    return ranks


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "c"),          # duplicate edge = double vote
    ("e", "sink"),                   # 'sink' is dangling (no out-edges)
]


def test_pagerank_matches_python_twin(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iterations=5).collect()}
    assert got == _twin_pagerank(EDGES, iterations=5)


def test_pagerank_partitioning_invariance(spark):
    """Bit-identical under a different partitioning (the determinism
    claim: integer sums are order-independent)."""
    df1 = spark.createDataFrame(EDGES, "src string, dst string")
    df8 = df1.repartition(8)
    r1 = {r.node: r.rank for r in pagerank(df1, iterations=3).collect()}
    r8 = {r.node: r.rank for r in pagerank(df8, iterations=3).collect()}
    assert r1 == r8


def test_pagerank_hub_ranks_highest(spark):
    # star graph: everything points at 'hub'
    edges = [(f"n{i}", "hub") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iterations=4).collect()}
    assert got == _twin_pagerank(edges, iterations=4)
    assert got["hub"] == max(got.values())
    assert got["hub"] > got["n0"]
    # leaves emit all mass, receive none: base rank only
    assert got["n0"] == (1000 - 850) * 1_000_000 // 1000


def test_pagerank_zero_iterations_and_guards(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iterations=0).collect()}
    assert set(got.values()) == {1_000_000}
    with pytest.raises(ValueError):
        pagerank(df, damping_milli=1001)
    with pytest.raises(ValueError):
        pagerank(df, iterations=-1)


def test_extract_links_real_html(spark):
    """Every real-web href form extracts and resolves: quote styles,
    attribute order, case, newlines in the tag, entities in the
    value, relative/root-relative/scheme-relative references, and the
    drop set (fragment-only, mailto/javascript, data-href decoy,
    empty value)."""
    html = (
        '<html><a href="https://a.com/x">dquote</a>'
        "<A HREF='http://b.org/y?q=1&amp;r=2'>squote+entity+case</A>"
        "<a class='c' rel=nofollow href=/rel/p>unquoted, href not first</a>"
        '<a href="../up/../q">relative with dots</a>'
        '<a\n\thref="//cdn.example/lib.js">scheme-relative, newline</a>'
        '<a href=" https://pad.example/t ">padded value</a>'
        '<a href="#frag">same-page</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a data-href="https://no.example/">decoy</a>'
        '<a href="">empty</a>'
        "</html>"
    )
    import pyspark.sql.functions as F

    pages = spark.createDataFrame(
        [("https://me.com/d/e", html)], "url string, html string"
    ).select("url", F.encode("html", "UTF-8").alias("html"))
    got = sorted(r.dst_url for r in extract_links(pages).collect())
    assert got == sorted(
        [
            "https://a.com/x",
            "http://b.org/y?q=1&r=2",
            "https://me.com/rel/p",
            "https://me.com/q",
            "https://cdn.example/lib.js",
            "https://pad.example/t",
        ]
    )


def test_domain_edges_collapses_and_drops_self_loops(spark):
    links = spark.createDataFrame(
        [
            ("https://www.a.com/p/1", "https://blog.a.com/p/2"),  # intra-domain
            ("https://www.a.com/p/1", "https://b.co.uk/x"),
        ],
        "src_url string, dst_url string",
    )
    got = [(r.src, r.dst) for r in domain_edges(links).collect()]
    assert got == [("a.com", "b.co.uk")]


def _twin_hits(edges, iterations=3, scale=1_000_000):
    """ops/linkgraph.hits integer recurrence in plain Python dicts."""
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    hubs = {n: scale for n in nodes}
    auths = {n: 0 for n in nodes}

    def rescale(raw):
        mx = max(max(raw.values()), 1)
        return {n: (v * scale) // mx for n, v in raw.items()}

    for _ in range(iterations):
        a_raw = {n: 0 for n in nodes}
        for s, d in edges:
            a_raw[d] += hubs[s]
        auths = rescale(a_raw)
        h_raw = {n: 0 for n in nodes}
        for s, d in edges:
            h_raw[s] += auths[d]
        hubs = rescale(h_raw)
    return {n: (hubs[n], auths[n]) for n in nodes}


def test_hits_matches_python_twin(spark):
    from sagan_spark.ops.linkgraph import hits

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: (r.hub, r.auth) for r in hits(df, iterations=3).collect()}
    assert got == _twin_hits(EDGES, iterations=3)


def test_hits_partitioning_invariance(spark):
    from sagan_spark.ops.linkgraph import hits

    df1 = spark.createDataFrame(EDGES, "src string, dst string")
    r1 = {r.node: (r.hub, r.auth) for r in hits(df1, iterations=2).collect()}
    r8 = {r.node: (r.hub, r.auth)
          for r in hits(df1.repartition(8), iterations=2).collect()}
    assert r1 == r8


def test_hits_star_topology(spark):
    """Star graph: the centre is the unique top authority (score =
    scale); every spoke is a top hub (score = scale); the centre has
    hub 0 and the spokes authority 0."""
    from sagan_spark.ops.linkgraph import hits

    star = [(f"s{i}", "hub") for i in range(6)]
    df = spark.createDataFrame(star, "src string, dst string")
    got = {r.node: (r.hub, r.auth) for r in hits(df, iterations=3).collect()}
    assert got["hub"] == (0, 1_000_000)
    for i in range(6):
        assert got[f"s{i}"] == (1_000_000, 0)


def test_hits_guards(spark):
    from sagan_spark.ops.linkgraph import hits

    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        hits(df, iterations=-1)
    # zero iterations: initial state (hub=scale, auth=0) for all nodes
    got = {r.node: (r.hub, r.auth) for r in hits(df, iterations=0).collect()}
    assert all(v == (1_000_000, 0) for v in got.values())


def test_frontier_candidates_hand_case(spark):
    """Discovered-but-uncrawled mining on a hand graph: crawled
    targets are anti-joined away, citation counts aggregate over
    canonicalized urls (tracking params dropped), and the per-domain
    rank is (n_refs desc, url asc)."""
    from pyspark.sql import functions as F

    from sagan_spark.ops.linkgraph import frontier_candidates

    pages = [
        # p1 cites ext/a twice (once with a tracking param -> same
        # canonical), ext/b once, and the crawled page p2
        ("https://site.com/p1",
         '<a href="https://ext.org/a">1</a>'
         '<a href="https://ext.org/a?utm_source=x">2</a>'
         '<a href="https://ext.org/b">3</a>'
         '<a href="https://site.com/p2">4</a>'),
        ("https://site.com/p2", '<a href="https://ext.org/b">5</a>'),
    ]
    df = spark.createDataFrame(pages, "url string, h string").select(
        "url", F.encode("h", "UTF-8").alias("html")
    )
    got = [
        (r.domain, r.url, r.n_refs, r.rank)
        for r in frontier_candidates(df, k=10)
        .orderBy("domain", "rank")
        .collect()
    ]
    assert got == [
        ("ext.org", "https://ext.org/a", 2, 1),
        ("ext.org", "https://ext.org/b", 2, 2),
    ]


def test_frontier_candidates_k_cut_deterministic(spark):
    """k=1 keeps exactly the (n_refs desc, url asc) head per domain."""
    from pyspark.sql import functions as F

    from sagan_spark.ops.linkgraph import frontier_candidates

    pages = [
        ("https://me.com/",
         '<a href="https://ext.org/z">1</a><a href="https://ext.org/a">2</a>'),
    ]
    df = spark.createDataFrame(pages, "url string, h string").select(
        "url", F.encode("h", "UTF-8").alias("html")
    )
    got = [(r.url, r.rank) for r in frontier_candidates(df, k=1).collect()]
    assert got == [("https://ext.org/a", 1)]


def test_triangle_stats_k4_pendant(spark):
    """K4 + pendant with duplicate/reversed/self edges: exact counts
    and clustering (a,b,c fully clustered; d half; pendant zero)."""
    from sagan_spark.ops.linkgraph import triangle_stats

    E = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("d", "e"), ("b", "a"), ("a", "a"), ("a", "b")]
    df = spark.createDataFrame(E, "src string, dst string")
    got = sorted(
        (r.node, r.degree, r.n_triangles, r.clustering_ppm)
        for r in triangle_stats(df).collect()
    )
    assert got == [
        ("a", 3, 3, 1_000_000), ("b", 3, 3, 1_000_000),
        ("c", 3, 3, 1_000_000), ("d", 4, 3, 500_000), ("e", 1, 0, 0),
    ]


def test_triangle_stats_brute_force_twin(spark):
    """Deterministic pseudo-random graph vs an itertools brute force."""
    import itertools

    from sagan_spark.ops.linkgraph import triangle_stats

    nodes = [f"n{i}" for i in range(12)]
    E = [
        (nodes[i], nodes[(i * 5 + j * 3) % 12])
        for i in range(12)
        for j in range(4)
    ]
    und = {frozenset(e) for e in E if e[0] != e[1]}
    adj = {n: set() for n in nodes}
    for e in und:
        x, y = tuple(e)
        adj[x].add(y)
        adj[y].add(x)
    tri = {
        n: sum(
            1
            for x, y in itertools.combinations(sorted(adj[n]), 2)
            if y in adj[x]
        )
        for n in nodes
    }
    df = spark.createDataFrame(E, "src string, dst string")
    got = {
        r.node: (r.degree, r.n_triangles)
        for r in triangle_stats(df).collect()
    }
    for n in nodes:
        if adj[n]:
            assert got[n] == (len(adj[n]), tri[n]), n
    plan = triangle_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "EvalPython" not in plan


def test_link_reciprocity_hand_case(spark):
    from sagan_spark.ops.linkgraph import link_reciprocity

    E = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"), ("a", "b"),
         ("d", "d")]
    got = {
        r.node: (r.n_out, r.n_mutual, r.reciprocity_ppm)
        for r in link_reciprocity(
            spark.createDataFrame(E, "src string, dst string")
        ).collect()
    }
    assert got == {
        "a": (2, 1, 500_000),   # b mutual, c not; duplicate edge collapsed
        "b": (1, 1, 1_000_000),
        "c": (1, 0, 0),         # c->d one-way
        # d: self-loop only -> no out-neighbors -> absent
    }


def test_pagerank_warm_start_identity(spark):
    """warm(k2, init=cold(k1)) == cold(k1+k2) bit-for-bit — the
    resume-from-snapshot contract of the integer formulation; a node
    absent from the snapshot re-enters at scale (cold start)."""
    from sagan_spark.ops.linkgraph import pagerank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    cold5 = {r.node: r.rank for r in pagerank(df, iterations=5).collect()}
    snap = pagerank(df, iterations=3).localCheckpoint(eager=True)
    warm = {
        r.node: r.rank
        for r in pagerank(df, iterations=2, init_ranks=snap).collect()
    }
    assert warm == cold5
    # dropping one node from the snapshot: it re-enters at scale, so
    # the first warm iteration equals cold(1) seeded with cold(3)
    # elsewhere — still deterministic, just a different (defined) run
    snap_missing = snap.filter(snap.node != sorted(cold5)[0])
    partial = pagerank(df, iterations=2, init_ranks=snap_missing)
    assert partial.count() == len(cold5)
