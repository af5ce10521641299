"""Connected components (dedup clustering): differential vs a pure-Python
union-find oracle over random graphs, plus structural worst cases."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aus_land_data_etl_spark.operators.graph import (
    connected_components,
    neardup_clusters,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical representative = min node id in component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def _spark_components(spark, n_nodes, edges):
    e = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
    got = connected_components(e, vertices=v)
    return {r["id"]: r["component"] for r in got.collect()}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(11)
    for trial in range(4):
        n = rng.randint(1, 60)
        m = rng.randint(0, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        assert _spark_components(spark, n, edges) == _union_find(n, edges), (
            trial, n, edges,
        )


def test_chain_worst_case_converges_logarithmically(spark):
    """A 200-node path (diameter 199) must converge — path halving makes
    rounds O(log diameter), so the 40-round cap is nowhere near."""
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _spark_components(spark, n, edges)
    assert set(got.values()) == {0}
    assert len(got) == n


def test_isolated_nodes_and_self_loops(spark):
    got = _spark_components(spark, 5, [(1, 1), (3, 4)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3}


def test_string_ids(spark):
    e = spark.createDataFrame(
        [("b", "c"), ("x", "y")], "src string, dst string"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(e).collect()
    }
    assert got == {"b": "b", "c": "b", "x": "x", "y": "x"}


def test_neardup_clusters_assigns_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 2), (2, 4)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in neardup_clusters(pairs, docs).collect()
    }
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 3, 5: 5}
    canonical = {d for d, c in got.items() if d == c}
    assert canonical == {0, 1, 3, 5}


def test_components_one_action_per_round(spark, monkeypatch):
    """The convergence probe rides the checkpoint job (observe() metrics)
    — no per-round count()/collect() action re-reading the checkpointed
    frame (round-4 verdict #3).  Pin it structurally: during a
    connected_components run, DataFrame.count/collect are never called
    and the only actions are the eager localCheckpoints (1 for the
    initial labels + 1 per round)."""
    # patch the concrete class (pyspark.sql.DataFrame is the abstract
    # base in Spark 4; classic sessions instantiate classic.dataframe)
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"checkpoint": 0, "count": 0, "collect": 0}
    orig_lc = DataFrame.localCheckpoint

    def lc(self, eager=True):
        calls["checkpoint"] += 1
        return orig_lc(self, eager)

    def cnt(self):
        calls["count"] += 1
        raise AssertionError("count() action inside connected_components")

    def col(self):
        calls["collect"] += 1
        raise AssertionError("collect() action inside connected_components")

    monkeypatch.setattr(DataFrame, "localCheckpoint", lc)
    monkeypatch.setattr(DataFrame, "count", cnt)
    monkeypatch.setattr(DataFrame, "collect", col)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    out = connected_components(edges)
    monkeypatch.undo()
    assert calls["count"] == 0 and calls["collect"] == 0
    assert calls["checkpoint"] >= 2  # initial labels + >=1 round
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {i: 0 for i in range(9)}
