"""Wave-28: node2vec biased walks + reciprocal-rank fusion.

The node2vec gate replays the ENTIRE walk (weights, prev-adjacency
marks, cumulative threshold draw) in a pure-Python mirror over the
operator's own capped adjacency and asserts per-step equality — the
strongest possible check of the second-order bias arithmetic. RRF gets
a hand-computed fusion golden plus the dominance property."""

from pyspark.sql import functions as F

import __spark_entry__ as E
from nerpii_spark.functions.hashing import M, h2, strhash
from nerpii_spark.operators import similarity as SIM
from nerpii_spark.operators.extract import (
    N2V_SALT,
    N2V_W_COM,
    N2V_W_OUT,
    N2V_W_RET,
    WALK_DEGREE_CAP,
    neighbor_sample,
    node2vec_walks,
)

SF = "/root/testdata/sf0.001"


def _mirror_walks(adj: dict[str, list[str]], n_steps: int):
    """Python mirror of node2vec_walks over an explicit adjacency."""
    adjset = {n: set(v) for n, v in adj.items()}
    out = []
    for root in sorted(adj):
        prev, cur = None, root
        for t in range(1, n_steps + 1):
            cands = sorted(adj.get(cur, ()))
            if not cands:
                break
            ws = []
            for n in cands:
                if prev is None:
                    w = N2V_W_COM
                elif n == prev:
                    w = N2V_W_RET
                elif n in adjset.get(prev, ()):
                    w = N2V_W_COM
                else:
                    w = N2V_W_OUT
                ws.append(w)
            tot = sum(ws)
            r = h2((strhash(root) + t * 31) % M, N2V_SALT) % tot
            cw = 0
            for n, w in zip(cands, ws):
                cw += w
                if cw > r:
                    nxt = n
                    break
            out.append((root, t, nxt))
            prev, cur = cur, nxt
    return out


def test_node2vec_matches_python_mirror_on_corpus(spark):
    triples = E._pipeline(spark, SF)["triples"]
    capped = neighbor_sample(triples, k=WALK_DEGREE_CAP)
    adj: dict[str, list[str]] = {}
    for r in capped.select("node", "nbr").collect():
        adj.setdefault(r["node"], []).append(r["nbr"])
    want = set(_mirror_walks(adj, 3))
    got = {
        (r["root"], r["step"], r["cur"])
        for r in node2vec_walks(triples, n_steps=3).collect()
    }
    assert got == want
    # structural: every step moves along a capped-adjacency edge
    adjset = {n: set(v) for n, v in adj.items()}
    pos = {r: r for r in adj}
    for t in range(1, 4):
        step = {a: c for a, s, c in got if s == t}
        for root, cur in step.items():
            assert cur in adjset[pos[root]], (root, t)
        pos.update(step)


def test_node2vec_bias_departs_from_first_order(spark):
    # weights genuinely alter at least one pick vs the uniform walk on
    # the real corpus (if they never did, the second-order machinery
    # would be dead code)
    from nerpii_spark.operators.extract import random_walks

    triples = E._pipeline(spark, SF)["triples"]
    n2v = {
        (r["root"], r["step"]): r["cur"]
        for r in node2vec_walks(triples, n_steps=3).collect()
    }
    fo = {
        (r["root"], r["step"]): r["cur"]
        for r in random_walks(triples, n_steps=3).collect()
    }
    diffs = sum(
        1 for k in n2v.keys() & fo.keys() if n2v[k] != fo[k]
    )
    assert diffs > 0


def test_rrf_hand_golden(spark):
    a = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "y"), (1, 3, "z")],
        "query_id bigint, rank bigint, neighbor_id string",
    )
    b = spark.createDataFrame(
        [(1, 1, "y"), (1, 2, "x"), (1, 3, "w")],
        "query_id bigint, rank bigint, neighbor_id string",
    )
    rows = {
        r["neighbor_id"]: r
        for r in SIM.rrf_fuse([a, b], k=4).collect()
    }
    e6 = 1_000_000
    assert rows["x"]["rrf_e6"] == e6 // 61 + e6 // 62
    assert rows["y"]["rrf_e6"] == e6 // 62 + e6 // 61
    assert rows["z"]["rrf_e6"] == e6 // 63
    assert rows["w"]["rrf_e6"] == e6 // 63
    # x and y tie on score -> neighbor_id breaks the tie deterministically
    assert rows["x"]["rank"] == 1 and rows["y"]["rank"] == 2
    assert rows["w"]["rank"] == 3 and rows["z"]["rank"] == 4  # w < z


def test_rrf_double_rank1_dominates(spark):
    both = spark.createDataFrame(
        [(1, 1, "top"), (1, 2, "mid")],
        "query_id bigint, rank bigint, neighbor_id string",
    )
    one = spark.createDataFrame(
        [(1, 1, "top"), (1, 2, "solo")],
        "query_id bigint, rank bigint, neighbor_id string",
    )
    rows = SIM.rrf_fuse([both, one], k=1).collect()
    assert len(rows) == 1 and rows[0]["neighbor_id"] == "top"
