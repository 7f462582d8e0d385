"""Property tests for the round-9 graph paths (the reference's
QuickCheck style, SURVEY.md §5.3): every dangling policy, the seeded
variant, weighted PageRank and weighted label propagation are checked
against ENGINE-INDEPENDENT exact-integer python references over
hypothesis-generated random multigraphs — a third implementation, so
agreement is evidence beyond the DuckDB oracle pair.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SCALE, DN, DD = 10**9, 85, 100

# random directed MULTIGRAPHS on a tiny node range: parallel rows and
# self-loops are legal inputs (parallel rows are the multiplicity view)
_edges = st.lists(
    st.tuples(
        st.integers(0, 5), st.integers(0, 5), st.integers(1, 3)
    ),
    min_size=1,
    max_size=12,
)


def _ref_pagerank(edges, iters, dangling, seeds=None):
    """Exact-integer reference mirroring the engine's semantics: the
    per-EDGE-ROW floor (rank*w) // out_strength, damped sum floored
    once per node, and the dangling correction applied after."""
    srcs = sorted({u for u, _, _ in edges})
    if dangling == "ignore":
        nodes = srcs
    else:
        nodes = sorted(
            {u for u, _, _ in edges} | {v for _, v, _ in edges}
        )
    work = list(edges)
    if dangling == "self":
        for n in nodes:
            if n not in srcs:
                work.append((n, n, 1))
    strength: dict = {}
    for u, _, w in work:
        strength[u] = strength.get(u, 0) + w
    n_nodes = len(nodes)
    if seeds is None:
        tp = {v: (DD - DN) * SCALE // DD for v in nodes}
        ranks = {v: SCALE for v in nodes}
    else:
        seeds = sorted(set(seeds))
        k = len(seeds)
        per_init = SCALE * n_nodes // k
        per_tp = (DD - DN) * SCALE * n_nodes // (DD * k)
        tp = {v: (per_tp if v in seeds else 0) for v in nodes}
        ranks = {v: (per_init if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for u, v, w in work:
            if v in inc and u in ranks:
                inc[v] += ranks[u] * w // strength[u]
        nxt = {v: tp[v] + DN * inc[v] // DD for v in nodes}
        if dangling == "redistribute":
            resid = n_nodes * SCALE - sum(nxt.values())
            assert resid >= 0  # every term floors: mass never created
            if seeds is None:
                add = resid // n_nodes
                nxt = {v: r + add for v, r in nxt.items()}
            else:
                add = resid // len(seeds)
                nxt = {
                    v: r + (add if v in seeds else 0)
                    for v, r in nxt.items()
                }
        ranks = nxt
    return ranks


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(edges=_edges, policy=st.sampled_from(["ignore", "self", "redistribute"]))
def _pagerank_policy_prop(spark, edges, policy):
    from striot_spark.functions.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, iterations=2, dangling=policy, weight="w"
        ).collect()
    }
    assert got == _ref_pagerank(edges, 2, policy)


def test_weighted_pagerank_all_dangling_policies_match_reference(spark):
    """Random weighted multigraphs (parallel rows + self-loops legal)
    × every dangling policy against the exact-integer reference."""
    _pagerank_policy_prop(spark)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(edges=_edges)
def _seeded_redistribute_prop(spark, edges):
    from striot_spark.functions.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = [edges[0][0]]  # always a src => in every policy's node set
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            df,
            iterations=2,
            seeds=seeds,
            dangling="redistribute",
            weight="w",
        ).collect()
    }
    assert got == _ref_pagerank(edges, 2, "redistribute", seeds=seeds)


def test_seeded_redistribute_pagerank_matches_reference(spark):
    """Personalized + dangling-redistribute composition: the residual
    returns to the seed set (DIV |S|), exact integers throughout."""
    _seeded_redistribute_prop(spark)


def _ref_lpa(edges, rounds):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    labels = {n: n for n in nodes}
    for _ in range(rounds):
        votes: dict = {}
        for u, v, w in edges:
            key = (v, labels[u])
            votes[key] = votes.get(key, 0) + w
        nxt = {}
        for n in nodes:
            cand = [
                (c, lab) for (v, lab), c in votes.items() if v == n
            ]
            if cand:
                # max weight, ties to the SMALLEST label
                best = max(c for c, _ in cand)
                nxt[n] = min(lab for c, lab in cand if c == best)
            else:
                nxt[n] = n  # no in-edges: falls back to own id
        labels = nxt
    return labels


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(edges=_edges, rounds=st.integers(1, 3))
def _lpa_prop(spark, edges, rounds):
    from striot_spark.functions.graph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(
            df, rounds=rounds, weight="w"
        ).collect()
    }
    assert got == _ref_lpa(edges, rounds)


def test_weighted_label_propagation_matches_reference(spark):
    """Synchronous weighted voting with smallest-label ties against a
    python reference, over random directed weighted multigraphs."""
    _lpa_prop(spark)


def _ref_khop2(edges):
    adj: dict = {}
    for u, v, _ in edges:
        adj.setdefault(u, set()).add(v)
    nodes = set(adj)
    out = {}
    for n in nodes:
        r1 = adj.get(n, set()) - {n}
        r2 = set()
        for x in r1:
            r2 |= adj.get(x, set())
        out[n] = (len(r1), len((r1 | r2) - {n}))
    return {n: v for n, v in out.items() if v[0] > 0}


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(edges=_edges)
def _khop_prop(spark, edges):
    from striot_spark.functions.graph import khop_reach

    df = spark.createDataFrame(
        [(u, v) for u, v, _ in edges], "src long, dst long"
    )
    got = {
        r["node"]: (r["reach_1"], r["reach_2"])
        for r in khop_reach(df, hops=2).collect()
    }
    assert got == _ref_khop2(edges)


def test_khop_reach_matches_reference(spark):
    """Exact ≤2-hop reach on random directed multigraphs (self-loops
    and parallel edges legal — both collapse in the distinct) against
    an independent python set-expansion reference. Nodes with no
    non-self out-edge emit no row (reach over OUT-edges, directed)."""
    _khop_prop(spark)


def _ref_edge_jaccard(pairs):
    ps = sorted({(a, b) for a, b in pairs if a != b})
    adj: dict = {}
    for a, b in ps:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for a, b in ps:
        common = len(adj[a] & adj[b])
        union = len(adj[a]) + len(adj[b]) - common
        out[(a, b)] = (common, union, common * 1_000_000 // union)
    return out


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 5), st.integers(6, 11)),
        min_size=1,
        max_size=12,
    )
)
def _jaccard_prop(spark, pairs):
    from striot_spark.functions.graph import edge_neighborhood_jaccard

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r["a"], r["b"]): (r["common_nbrs"], r["union_nbrs"], r["j_ppm"])
        for r in edge_neighborhood_jaccard(df).collect()
    }
    assert got == _ref_edge_jaccard(pairs)


def test_edge_neighborhood_jaccard_matches_reference(spark):
    """Per-edge common/union/Jaccard-ppm on random bipartite-shaped
    canonical pairs (a < b guaranteed by the disjoint ranges; duplicate
    pairs legal — the function dedups) against a python set
    reference."""
    _jaccard_prop(spark)
