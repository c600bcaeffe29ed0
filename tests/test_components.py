"""Connected components (large-star/small-star) vs a pure-python
union-find oracle, plus the canonical-survivor dedup built on top."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from whakoom_webscrapper_spark.operators import components as C


def _union_find(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member, matching connected_components' contract
    comp_min: dict[int, int] = {}
    for v in n_nodes:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in n_nodes}


def _run(spark, edges, vertices=None, **kw):
    e = spark.createDataFrame(
        edges or [(0, 0)], "src INT, dst INT"
    )
    if not edges:
        e = e.where(F.lit(False))
    vdf = (
        spark.createDataFrame([(v,) for v in vertices], "id INT")
        if vertices is not None
        else None
    )
    out = C.connected_components(e, vertices=vdf, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_two_triangles_and_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)]
    got = _run(spark, edges)
    nodes = sorted({v for e in edges for v in e})
    assert got == _union_find(nodes, edges)
    assert got[12] == 1 and got[21] == 20


def test_long_chain_converges_in_log_rounds(spark):
    # worst case for label propagation (diameter 63); the star
    # alternation must close it in far fewer than 63 rounds —
    # local_max_edges=0 forces the DISTRIBUTED rounds under test
    edges = [(i, i + 1) for i in range(63)]
    got = _run(spark, edges, max_iter=8, local_max_edges=0)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_random_graphs_match_union_find(spark):
    # run BOTH execution paths (driver union-find fast path and the
    # distributed star rounds) against the python oracle — the round-6
    # size-adaptive cutover must be invisible in the result
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        nodes = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        expected = _union_find(nodes, edges)
        for lme in (None, 0):
            kw = {} if lme is None else {"local_max_edges": 0}
            got = _run(spark, edges, vertices=nodes, **kw)
            assert got == expected, f"local_max_edges={lme}"


def test_empty_edges_and_isolated_vertices(spark):
    got = _run(spark, [], vertices=[5, 6, 7])
    assert got == {5: 5, 6: 6, 7: 7}


def test_assignment_is_functional_and_deterministic(spark):
    edges = [(1, 2), (2, 3), (4, 5), (5, 1)]
    a = _run(spark, edges)
    b = _run(spark, edges)
    assert a == b == {v: 1 for v in (1, 2, 3, 4, 5)}


def test_dedup_canonical_latest_wins(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id INT, body STRING"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "src INT, dst INT"
    )
    out = C.dedup_canonical(docs, pairs, id_col="doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    # cluster {0,1,2} -> 2, cluster {5,6} -> 6, singletons 3,4,7 survive
    assert kept == [2, 3, 4, 6, 7]


def test_dedup_canonical_prefer_column(spark):
    docs = spark.createDataFrame(
        [(0, 10), (1, 99), (2, 50), (3, 1)],
        "doc_id INT, quality INT",
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "src INT, dst INT")
    out = C.dedup_canonical(docs, pairs, id_col="doc_id", prefer="quality")
    kept = sorted(r["doc_id"] for r in out.collect())
    # best-quality survivor (doc 1, q=99) + untouched singleton 3
    assert kept == [1, 3]
