"""Hand-crafted-graph goldens for the round-3 web-graph/link additions:
host components (WCC), bounded-round LPA communities, and FastSS
deletion-neighborhood fuzzy pairs — each checked against an
independently hand-computed (or brute-forced in Python) expectation,
not against the operator's own DuckDB oracle."""

from pyspark.sql import functions as F

from nerpii_spark.operators.link import fuzzy_surface_pairs
from nerpii_spark.operators.webgraph import host_components, lpa_communities


def _pages(spark, edges):
    """Fake pages whose html plants exactly the given (src, dst) host
    edges — one page per src host carrying all its outlinks."""
    by_src = {}
    for s, d in edges:
        by_src.setdefault(s, []).append(d)
    rows = [
        (
            f"https://{s}/p",
            (
                "<html><body>"
                + "".join(f'<a href="https://{d}/">x</a>' for d in ds)
                + "</body></html>"
            ).encode(),
        )
        for s, ds in by_src.items()
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_host_components_two_islands(spark):
    # path a-b-c plus isolated pair x-y: two components, min-label roots
    pages = _pages(
        spark,
        [("a.io", "b.io"), ("b.io", "c.io"), ("x.io", "y.io")],
    )
    got = {
        (r["host"], r["component"])
        for r in host_components(pages).collect()
    }
    assert got == {
        ("a.io", "a.io"),
        ("b.io", "a.io"),
        ("c.io", "a.io"),
        ("x.io", "x.io"),
        ("y.io", "x.io"),
    }


def test_lpa_majority_and_tiebreak(spark):
    # star: center z linked to a, b, c. Round 1 (synchronous): z sees
    # {a, b, c} -> min-tie 'a'; each leaf sees {z} -> 'z'. Round 2:
    # z sees the leaves' round-1 labels {z, z, z} -> 'z'; each leaf
    # sees z's round-1 label 'a'.
    pages = _pages(
        spark, [("z.io", "a.io"), ("z.io", "b.io"), ("z.io", "c.io")]
    )
    got = {
        (r["host"], r["community"])
        for r in lpa_communities(pages, n_rounds=2).collect()
    }
    assert got == {
        ("z.io", "z.io"),
        ("a.io", "a.io"),
        ("b.io", "a.io"),
        ("c.io", "a.io"),
    }


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def test_fuzzy_pairs_equal_python_bruteforce(spark):
    # substitution (Dawson/Lawson), deletion (David/Davide), a
    # transposition at distance 2 (Mark/Makr - must NOT pair), and an
    # unrelated surface
    surfaces = [
        "David Dawson",
        "David Lawson",
        "Davide Dawson",
        "Mark Webb",
        "Makr Webb",
        "Alice Stone",
    ]
    mentions = spark.createDataFrame(
        [("PERSON", s) for s in surfaces] + [("ORGANIZATION", "Davide Dawson Inc")],
        "entity_type string, mention string",
    )
    want = {
        (a, b, _lev(a, b))
        for i, a in enumerate(surfaces)
        for b in surfaces[i + 1 :]
        if _lev(a, b) <= 1
    }
    # normalize to (min, max) ordering like the operator's s < t
    want = {(min(a, b), max(a, b), d) for a, b, d in want}
    got = {
        (r["a"], r["b"], r["dist"])
        for r in fuzzy_surface_pairs(mentions).collect()
    }
    assert got == want
    assert ("Makr Webb", "Mark Webb", 2) not in got  # transposition excluded
    assert any(d == 1 for *_, d in got)  # non-degenerate


def test_fuzzy_max_len_bounds_explode(spark):
    long_s = "X" * 60
    mentions = spark.createDataFrame(
        [("PERSON", long_s), ("PERSON", long_s[:-1])],
        "entity_type string, mention string",
    )
    assert fuzzy_surface_pairs(mentions, max_len=40).count() == 0
    assert fuzzy_surface_pairs(mentions, max_len=80).count() == 1


def test_crawl_depth_bounded_bfs(spark):
    from nerpii_spark.operators.webgraph import crawl_depth

    # path s-a-b-c-d-e; with n_seeds=1 the seed is the max-in-degree
    # host. Edges all point INTO s's chain start so in-degree picks 's'.
    # Graph: x1->s, x2->s (s indeg 2), s->a, a->b, b->c, c->d, d->e.
    pages = _pages(
        spark,
        [
            ("x1.io", "s.io"),
            ("x2.io", "s.io"),
            ("s.io", "a.io"),
            ("a.io", "b.io"),
            ("b.io", "c.io"),
            ("c.io", "d.io"),
            ("d.io", "e.io"),
        ],
    )
    got = {
        (r["host"], r["depth"])
        for r in crawl_depth(pages, n_seeds=1, max_depth=3).collect()
    }
    # seed s at 0; undirected hops: x1/x2/a at 1, b at 2, c at 3;
    # d, e beyond the horizon -> omitted
    assert got == {
        ("s.io", 0),
        ("x1.io", 1),
        ("x2.io", 1),
        ("a.io", 1),
        ("b.io", 2),
        ("c.io", 3),
    }


def test_trustrank_demotes_unreachable_spam_island(spark):
    from nerpii_spark.operators.extract import pagerank
    from nerpii_spark.operators.webgraph import (
        host_edges_for_pagerank,
        trustrank,
    )

    # good core: g is linked by 3 hosts (top in-degree -> the seed);
    # g links onward to t. Spam island: s1 <-> s2 mutual links, never
    # linked from the good side.
    pages = _pages(
        spark,
        [
            ("a.io", "g.io"),
            ("b.io", "g.io"),
            ("c.io", "g.io"),
            ("g.io", "t.io"),
            ("s1.spam", "s2.spam"),
            ("s2.spam", "s1.spam"),
        ],
    )
    edges = host_edges_for_pagerank(pages)
    trust = {r["node"]: r["trust_e12"] for r in trustrank(edges, n_seeds=1).collect()}
    pr = {r["node"]: r["rank_e12"] for r in pagerank(edges).collect()}
    # plain PageRank pays the mutually-linking island real rank;
    # TrustRank gives it exactly zero (no path from the seed)
    assert pr["s1.spam"] > 0 and pr["s2.spam"] > 0
    assert trust["s1.spam"] == 0 and trust["s2.spam"] == 0
    # trust flows seed -> t.io along links (g forwards 85% of its mass
    # per round, so the downstream sink can legitimately exceed the seed)
    assert trust["g.io"] > 0 and trust["t.io"] > 0
    # hosts with no in-path from the seed hold no trust at all
    assert trust["a.io"] == 0 and trust["b.io"] == 0 and trust["c.io"] == 0


def test_anf_estimates_match_exact_bfs(spark):
    from collections import deque

    from nerpii_spark.operators.webgraph import neighborhood_function

    # deterministic 400-node graph: ring + two hub spokes per node
    # (consecutive hubs share members), so balls SATURATE by r=3
    # (~6.3x the 64 registers — out of the raw-HLL small-range regime;
    # r<=2 balls are smaller and carry the documented small-range bias,
    # so no accuracy claim is made there)
    n = 400
    edges = [(f"n{i:03d}.x", f"n{(i + 1) % n:03d}.x") for i in range(n)]
    edges += [(f"n{i:03d}.x", f"hub{i % 4}.x") for i in range(n)]
    edges += [(f"n{i:03d}.x", f"hub{(i + 1) % 4}.x") for i in range(n)]
    pages = _pages(spark, edges)

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exact = {}
    for r in range(4):
        tot = 0
        for v in adj:
            seen = {v}
            frontier = deque([(v, 0)])
            while frontier:
                u, d = frontier.popleft()
                if d == r:
                    continue
                for w in adj[u]:
                    if w not in seen:
                        seen.add(w)
                        frontier.append((w, d + 1))
            tot += len(seen)
        exact[r] = tot

    got = {
        r["r"]: r["est_pairs"]
        for r in neighborhood_function(pages, n_rounds=3).collect()
    }
    # r=0 is the documented small-range regime (raw HLL reads ~alpha*m
    # per single-element ball) — no accuracy claim there
    assert got[1] <= got[2] <= got[3]  # balls only grow
    assert exact[3] >= 6 * 64 * len(adj) * 0.9  # saturation premise holds
    rel = abs(got[3] - exact[3]) / exact[3]
    assert rel < 0.25, (got[3], exact[3], rel)


def test_kcore_peels_cascading_tail_keeps_clique(spark):
    """K4 clique + a 3-hop tail. At k=2 the tail peels CASCADING (g
    round 1, f round 2, e round 3 — each removal exposes the next), so
    the default round budget must absorb a multi-round cascade; the
    clique survives with in-core degree 3. At k=3 the whole tail drops
    in one round. Fixpoint: one extra round changes nothing, and a
    too-small budget provably differs (rounds are load-bearing)."""
    from nerpii_spark.operators.webgraph import kcore

    clique = [
        ("a.io", "b.io"), ("a.io", "c.io"), ("a.io", "d.io"),
        ("b.io", "c.io"), ("b.io", "d.io"), ("c.io", "d.io"),
    ]
    tail = [("d.io", "e.io"), ("e.io", "f.io"), ("f.io", "g.io")]
    pages = _pages(spark, clique + tail)
    want = {(h, 3) for h in ("a.io", "b.io", "c.io", "d.io")}

    got3 = {(r["host"], r["core_deg"]) for r in kcore(pages, k=3).collect()}
    assert got3 == want

    got2 = {(r["host"], r["core_deg"])
            for r in kcore(pages, k=2, n_rounds=3).collect()}
    assert got2 == want
    got2_more = {(r["host"], r["core_deg"])
                 for r in kcore(pages, k=2, n_rounds=4).collect()}
    assert got2_more == got2  # fixpoint reached inside the budget
    short = {(r["host"], r["core_deg"])
             for r in kcore(pages, k=2, n_rounds=2).collect()}
    assert short != got2  # e survives a 2-round budget: cascade is real


def test_kcore_planted_corpus_reaches_fixpoint(spark):
    """The driver query's FIXED round budget (KCORE_ROUNDS) is verified,
    not hoped: one extra round over the sf0.001 planted host graph is a
    no-op — the docstring's convergence contract."""
    import __spark_entry__ as E
    from nerpii_spark.operators.webgraph import KCORE_ROUNDS, kcore

    pages = E._pipeline(spark, "/root/testdata/sf0.001")["pages"]
    base = {(r["host"], r["core_deg"]) for r in kcore(pages).collect()}
    more = {(r["host"], r["core_deg"])
            for r in kcore(pages, n_rounds=KCORE_ROUNDS + 1).collect()}
    assert more == base
    assert base  # the hub-dense planted graph has a non-empty 3-core


def test_host_mirrors_planted_mirror_graph(spark):
    """Two literal mirrors (identical out-sets) must rank 1 with
    sim_e6 = 1e6; a partial overlap ranks below with the exact
    integer Jaccard; hosts sharing ONLY a capped hot destination (every
    host links hub.io, df > max_df) must not pair through it — but the
    hot destination still counts in the EXACT intersection of pairs
    found through a low-df destination."""
    from nerpii_spark.operators.webgraph import host_mirror_topk

    edges = [
        ("m1.io", d) for d in ("x.io", "y.io", "z.io")
    ] + [
        ("m2.io", d) for d in ("x.io", "y.io", "z.io")
    ] + [
        ("p.io", "x.io"), ("p.io", "q.io"),
        ("lone.io", "w.io"),
    ]
    hub = [(s, "hub.io") for s in ("m1.io", "m2.io", "p.io", "lone.io")]
    pages = _pages(spark, edges + hub)
    got = [
        (r["rank"], r["host_a"], r["host_b"],
         r["n_inter"], r["n_union"], r["sim_e6"])
        for r in host_mirror_topk(pages, max_df=3)
        .orderBy("rank").collect()
    ]
    # m1/m2: out-sets {x,y,z,hub} identical -> J=1. p pairs with each
    # mirror through x.io (df=3 <= cap); inter = {x, hub} = 2 of
    # union 5. lone.io shares only the capped hub -> never a candidate.
    assert got == [
        (1, "m1.io", "m2.io", 4, 4, 1000000),
        (2, "m1.io", "p.io", 2, 5, 400000),
        (3, "m2.io", "p.io", 2, 5, 400000),
    ]


def test_recrawl_cadence_crafted_log(spark):
    """Hand-computed cadence golden: variants of one page collapse to a
    single canonical URL whose gaps are the inter-capture deltas;
    single-capture URLs contribute captures but no gaps; avg is integer
    floor-div."""
    from nerpii_spark.operators.webgraph import recrawl_cadence

    rows = [
        # one page, 3 captures via variants: gaps 100 and 50
        ("https://a.io/p1", 1000), ("https://a.io/p1?utm=x", 1100),
        ("https://a.io/p1#frag", 1150),
        # same host, second page: 2 captures, gap 7
        ("https://a.io/p2", 2000), ("https://a.io/p2/", 2007),
        # other host: single capture -> no gaps, null stats
        ("https://b.io/q", 5000),
    ]
    crawl = spark.createDataFrame(rows, "url string, ts_s bigint")
    got = {r["host"]: r for r in recrawl_cadence(crawl).collect()}
    a = got["a.io"]
    assert (a["n_urls"], a["n_captures"], a["n_gaps"]) == (2, 5, 3)
    assert (a["min_gap_s"], a["max_gap_s"]) == (7, 100)
    assert a["avg_gap_s"] == (100 + 50 + 7) // 3  # floor-div, = 52
    b = got["b.io"]
    assert (b["n_urls"], b["n_captures"], b["n_gaps"]) == (1, 1, 0)
    assert b["min_gap_s"] is None and b["avg_gap_s"] is None


def test_kcore_matches_python_bruteforce_random_graphs(spark):
    """Synchronous-peel cross-validation: for seeded random digraphs the
    distributed bounded-round peel must equal an independent Python
    replay of the same rounds — and for a generous round budget that
    replay equals the true converged k-core."""
    import random
    from collections import Counter

    from nerpii_spark.operators.webgraph import kcore

    def py_kcore(edges, k, rounds):
        sym = set()
        for u, v in edges:
            if u != v:
                sym.add((u, v))
                sym.add((v, u))
        for _ in range(rounds):
            deg = Counter(u for u, _ in sym)
            keep = {u for u, c in deg.items() if c >= k}
            sym = {(u, v) for u, v in sym if u in keep and v in keep}
        return dict(Counter(u for u, _ in sym))

    for seed in (1, 7):
        rng = random.Random(seed)
        nodes = [f"h{i}.io" for i in range(14)]
        edges = list({
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(30)
        })
        edges = [(u, v) for u, v in edges if u != v]
        pages = _pages(spark, edges)
        for k, rounds in ((2, 6), (3, 6)):
            want = py_kcore(edges, k, rounds)
            got = {
                r["host"]: r["core_deg"]
                for r in kcore(pages, k=k, n_rounds=rounds).collect()
            }
            assert got == want, (seed, k)
            # 6 rounds is past the fixpoint on 14 nodes: equals truth
            assert want == py_kcore(edges, k, 20), (seed, k)


def test_host_mirrors_matches_python_bruteforce(spark):
    """Mirror ranking cross-validation on a seeded random graph: an
    independent Python replay of df-cap, exact counts and the
    deterministic (sim desc, host asc) ranking."""
    import random

    from nerpii_spark.operators.webgraph import host_mirror_topk

    rng = random.Random(3)
    nodes = [f"h{i}.io" for i in range(10)]
    edges = list({
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(40)
    })
    edges = [(u, v) for u, v in edges if u != v]
    max_df, k = 3, 8
    outs = {}
    for u, v in edges:
        outs.setdefault(u, set()).add(v)
    df = {}
    for u, vs in outs.items():
        for v in vs:
            df[v] = df.get(v, 0) + 1
    lowdf = {v for v, c in df.items() if c <= max_df}
    cand = {
        (a, b)
        for a in outs
        for b in outs
        if a < b and (outs[a] & outs[b] & lowdf)
    }
    scored = []
    for a, b in cand:
        ni = len(outs[a] & outs[b])
        nu = len(outs[a] | outs[b])
        scored.append((-(ni * 1000000 // nu), a, b, ni, nu))
    scored.sort()
    want = [
        (i + 1, a, b, ni, nu, -negs)
        for i, (negs, a, b, ni, nu) in enumerate(scored[:k])
    ]
    got = [
        (r["rank"], r["host_a"], r["host_b"],
         r["n_inter"], r["n_union"], r["sim_e6"])
        for r in host_mirror_topk(_pages(spark, edges), k=k,
                                  max_df=max_df).orderBy("rank").collect()
    ]
    assert got == want


def test_outlink_entropy_hand_goldens(spark):
    """Hand-computed integer-entropy goldens: a single-destination host
    scores exactly 0 regardless of volume; a uniform 4-way host scores
    exactly 2000 milli-bits (both logs land on powers of two, so the
    floor approximation is exact there); a skewed host matches the
    identity computed by hand."""
    from nerpii_spark.operators.webgraph import outlink_entropy

    edges = (
        # mono.io: 4 links, all to one host -> H = 0
        [("mono.io", "x.io")] * 4
        # uni.io: 4 links to 4 distinct hosts -> H = log2(4) = 2.000
        + [("uni.io", d) for d in ("a.io", "b.io", "c.io", "d.io")]
        # skew.io: counts {6, 2} over 8 links:
        #   1000*ilog2(8) - 1000*(6*ilog2(6) + 2*ilog2(2)) div 8
        # = 3000 - 1000*(6*2 + 2*1) div 8 = 3000 - 1750 = 1250
        + [("skew.io", "a.io")] * 6
        + [("skew.io", "b.io")] * 2
    )
    pages = _pages(spark, edges)
    got = {
        r["src_host"]: (r["n_dst"], r["n_links"], r["entropy_milli"])
        for r in outlink_entropy(pages).collect()
    }
    assert got == {
        "mono.io": (1, 4, 0),
        "uni.io": (4, 4, 2000),
        "skew.io": (2, 8, 1250),
    }


def test_harmonic_centrality_hubs_outrank_periphery(spark):
    """On the planted corpus every hub host (linked from ~1/13 of all
    pages — distance 1 from most of the graph) must outrank the MEDIAN
    site host in harmonic centrality; sketch noise (~13% per ball with
    64 registers) cannot close a gap that structural."""
    import statistics

    import __spark_entry__ as E
    from nerpii_spark.operators.webgraph import harmonic_centrality

    pages = E._pipeline(spark, "/root/testdata/sf0.001")["pages"]
    rows = harmonic_centrality(pages).collect()
    hubs = [r["harmonic_milli"] for r in rows if r["host"].startswith("hub")]
    sites = [r["harmonic_milli"] for r in rows
             if not r["host"].startswith("hub")]
    assert hubs and sites
    med = statistics.median(sites)
    assert all(h > med for h in hubs)


def test_effective_diameter_replays_from_anf_curve(spark):
    """The composition is certified against a Python replay over the
    operator's own ANF rows (accuracy of the rows themselves is
    test_anf_estimates_match_exact_bfs's job): smallest r with
    10*N(r) >= 9*N(horizon), horizon = est at max r; on the planted
    small-world graph (every page one hop from a hub) it is tiny."""
    import __spark_entry__ as E
    from nerpii_spark.operators.webgraph import (
        effective_diameter,
        neighborhood_function,
    )

    pages = E._pipeline(spark, "/root/testdata/sf0.001")["pages"]
    nf = {r["r"]: r["est_pairs"]
          for r in neighborhood_function(pages).collect()}
    horizon = nf[max(nf)]
    want = min(r for r, est in nf.items() if 10 * est >= 9 * horizon)
    got = effective_diameter(pages).collect()
    assert len(got) == 1
    assert (got[0]["eff_diameter"], got[0]["est_max"]) == (want, horizon)
    assert got[0]["eff_diameter"] <= 3  # planted hub topology is small-world


def test_host_reciprocity_hand_golden(spark):
    from nerpii_spark.operators.webgraph import host_reciprocity

    # a <-> b mutual; a -> c one-way. c emits no links -> no row for c
    # (the metric is defined over out-edges).
    pages = _pages(
        spark, [("a.io", "b.io"), ("b.io", "a.io"), ("a.io", "c.io")]
    )
    got = {
        r["host"]: (r["n_out"], r["n_recip"], r["recip_milli"])
        for r in host_reciprocity(pages).collect()
    }
    assert got == {"a.io": (2, 1, 500), "b.io": (1, 1, 1000)}


def test_assortativity_star_is_minus_one(spark):
    from nerpii_spark.operators.webgraph import degree_assortativity

    # star z-{a,b,c}: every edge joins deg-3 to deg-1 -> r = -1 exactly.
    # Hand sums over the 6 directed stubs: m=6, Sx=12, Sxx=30, Sxy=18,
    # num = 6*18 - 144 = -36, den = 6*30 - 144 = 36.
    pages = _pages(
        spark, [("z.io", "a.io"), ("z.io", "b.io"), ("z.io", "c.io")]
    )
    [r] = degree_assortativity(pages).collect()
    assert (
        r["m_stubs"],
        r["sum_deg"],
        r["sum_deg_sq"],
        r["sum_deg_prod"],
        r["r_milli"],
    ) == (6, 12, 30, 18, -1000)


def test_assortativity_regular_graph_is_null(spark):
    from nerpii_spark.operators.webgraph import degree_assortativity

    # 4-cycle: every node has degree 2 -> zero variance -> NULL r_milli
    # (nullif guard, not a divide error under ANSI mode)
    pages = _pages(
        spark,
        [
            ("a.io", "b.io"),
            ("b.io", "c.io"),
            ("c.io", "d.io"),
            ("d.io", "a.io"),
        ],
    )
    [r] = degree_assortativity(pages).collect()
    assert r["r_milli"] is None and r["m_stubs"] == 8


def test_spam_mass_flags_unreachable_island(spark):
    from nerpii_spark.operators.webgraph import spam_mass

    # same shape as the trustrank test: good core around seed g.io,
    # mutually-linking spam island s1 <-> s2 with no in-path from g.
    pages = _pages(
        spark,
        [
            ("a.io", "g.io"),
            ("b.io", "g.io"),
            ("c.io", "g.io"),
            ("g.io", "t.io"),
            ("s1.spam", "s2.spam"),
            ("s2.spam", "s1.spam"),
        ],
    )
    sm = {r["host"]: r for r in spam_mass(pages, n_seeds=1).collect()}
    # the island holds real PageRank but zero trust -> spam mass 1000
    assert sm["s1.spam"]["trust_e12"] == 0
    assert sm["s1.spam"]["rank_e12"] > 0
    assert sm["s1.spam"]["spam_milli"] == 1000
    assert sm["s2.spam"]["spam_milli"] == 1000
    # the trusted path scores strictly lower; the downstream sink t.io
    # accumulates more trust than rank -> negative spam mass
    assert sm["g.io"]["spam_milli"] < 1000
    assert sm["t.io"]["spam_milli"] < 0


def test_scd2_urls_interval_spine(spark):
    from nerpii_spark.operators.webgraph import scd2_urls

    # one page captured 3x under url variants (same canonical), one once
    crawl = spark.createDataFrame(
        [
            ("https://a.io/p", 100),
            ("https://a.io/p?utm_source=x", 200),
            ("https://a.io/p#frag", 350),
            ("https://b.io/q", 500),
        ],
        "url string, ts_s long",
    )
    got = sorted(
        (r["curl"], r["version"], r["valid_from_s"], r["valid_to_s"],
         r["is_current"])
        for r in scd2_urls(crawl).collect()
    )
    assert got == [
        ("https://a.io/p", 1, 100, 199, False),
        ("https://a.io/p", 2, 200, 349, False),
        ("https://a.io/p", 3, 350, None, True),
        ("https://b.io/q", 1, 500, None, True),
    ]


def test_host_quota_caps_and_is_hash_deterministic(spark):
    from nerpii_spark.functions.hashing import h1
    from nerpii_spark.operators.webgraph import host_quota_sample

    # 20 docs on one host, 3 on another; cap k=8
    rows = [(f"https://big.io/p/{i}", i) for i in range(20)] + [
        (f"https://small.io/p/{i}", 100 + i) for i in range(3)
    ]
    pages = spark.createDataFrame(rows, "url string, doc_id long")
    got = {}
    for r in host_quota_sample(pages, k=8).collect():
        got.setdefault(r["host"], []).append(r["doc_id"])
    assert len(got["big.io"]) == 8 and sorted(got["small.io"]) == [100, 101, 102]
    # kept set = the 8 smallest by the portable hash (python mirror)
    want = sorted(range(20), key=lambda d: (h1(d, 53), d))[:8]
    assert sorted(got["big.io"]) == sorted(want)


def test_modularity_matches_python_mirror_of_lpa_partition(spark):
    from nerpii_spark.operators.webgraph import lpa_communities, modularity

    # two triangles joined by one bridge — whatever partition bounded
    # -round LPA lands on, the statistic must equal the Python mirror
    # computed from THAT partition (truncating division, the Spark/Duck
    # `div`//`//` semantics — python's flooring // differs on negatives)
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a1", "b1"),
    ]
    und = {(f"{u}.io", f"{v}.io") for u, v in edges}
    pages = _pages(spark, sorted(und))
    lab = {
        r["host"]: r["community"] for r in lpa_communities(pages).collect()
    }
    sym = sorted(und | {(v, u) for u, v in und})
    deg: dict[str, int] = {}
    for u, _ in sym:
        deg[u] = deg.get(u, 0) + 1
    S = len(sym)
    e_in = sum(1 for u, v in sym if lab[u] == lab[v])
    dc: dict[str, int] = {}
    for n, d in deg.items():
        dc[lab[n]] = dc.get(lab[n], 0) + d
    sum_dc2 = sum(d * d for d in dc.values())
    num = 1_000_000 * (S * e_in - sum_dc2)
    den = S * S
    trunc_div = abs(num) // den * (1 if num >= 0 else -1)
    [r] = modularity(pages).collect()
    assert (
        r["s_stubs"], r["e_in_stubs"], r["sum_dc2"], r["q_e6"]
    ) == (S, e_in, sum_dc2, trunc_div)
    assert S == 14
