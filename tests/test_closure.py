"""Fixpoint closure unit tests — cycles, deep chains, keyed closure
(reference: transitive_closure / transitive_closure_pair,
src/plan.rs:2252-2299; the frontier-only checkpoint strategy must not
change results)."""

from __future__ import annotations

import pytest

from yago4_spark.operators.closure import (
    ClosureDidNotConverge,
    transitive_closure,
    transitive_closure_pair,
    transitive_reduction_step,
)


def nodes(df):
    return {r[0] for r in df.collect()}


def test_closure_cycle_terminates(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = nodes(transitive_closure(seeds, edges))
    assert got == {1, 2, 3, 4}


def test_closure_deep_chain(spark):
    depth = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(depth)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = nodes(transitive_closure(seeds, edges))
    assert got == set(range(depth + 1))


def test_closure_iteration_cap(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(ClosureDidNotConverge):
        transitive_closure(seeds, edges, max_iterations=3)


def test_closure_pair_keyed(spark):
    edges = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string")
    pairs = spark.createDataFrame(
        [(1, "b"), (2, "x"), (3, "lone")], "key int, node string")
    got = {tuple(r) for r in transitive_closure_pair(pairs, edges).collect()}
    assert got == {
        (1, "b"), (1, "c"), (1, "d"),
        (2, "x"), (2, "y"),
        (3, "lone"),
    }


def test_transitive_reduction_step(spark):
    # a->b, b->c, a->c : the direct a->c edge is implied, dropped
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "child string, parent string")
    got = {tuple(r) for r in transitive_reduction_step(edges).collect()}
    assert got == {("a", "b"), ("b", "c")}
