"""Property-based tests (SURVEY.md §5 item 4, FIXTURES.md §4)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from importtoneo4j_spark.operators.canonicalize import connected_components


def union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), set()).add(x)
    return {frozenset(v) for v in comp.values()}


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=25), st.integers(min_value=0, max_value=25)
    ),
    min_size=1,
    max_size=40,
).filter(lambda es: any(a != b for a, b in es))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_cc_matches_union_find(spark, edges):
    """Spark hash-min CC == sequential union-find on arbitrary graphs, and
    component id == min member id."""
    rows = [(f"n{a:02d}", f"n{b:02d}") for a, b in edges if a != b]
    df = spark.createDataFrame(rows, ["src", "dst"])
    got = connected_components(df).collect()
    by_comp: dict[str, set[str]] = {}
    for r in got:
        by_comp.setdefault(r["comp"], set()).add(r["id"])
    # invariant 1: component id is the minimum member id
    for comp, members in by_comp.items():
        assert comp == min(members)
    # invariant 2: partition matches union-find
    want = union_find_components(rows)
    assert {frozenset(v) for v in by_comp.values()} == want


@pytest.mark.parametrize("seed", [7, 99])
def test_pr_holds_across_seeds(spark, tmp_path_factory, seed):
    """The P/R >= 0.95 gate is not seed-specific."""
    from importtoneo4j_spark.datagen import TranscriptGenerator
    from importtoneo4j_spark.oracle import Oracle, precision_recall
    from importtoneo4j_spark.plans.pipeline import KGPipeline

    gen = TranscriptGenerator(seed=seed, n_entities=100)
    path = str(tmp_path_factory.mktemp("prseed") / "t")
    gen.write_parquet(path, n_convs=60)
    work = str(tmp_path_factory.mktemp("prseed") / "kg")
    pipe = KGPipeline(spark, path, work, run_id="r")
    pipe.run()
    engine = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe.triples().select("subj", "pred", "obj").collect()
    }
    oracle = Oracle(gen.turns_pandas(60), gen.alias_truth())
    p, r = precision_recall(engine, oracle.triple_set())
    assert p >= 0.95 and r >= 0.95, f"seed={seed}: p={p:.4f} r={r:.4f}"


def test_every_mention_one_canonical(spark, gen, small_transcripts_path, tmp_path_factory):
    """FIXTURES invariant: every vocabulary surface maps to exactly one
    canonical id."""
    from importtoneo4j_spark.plans.pipeline import KGPipeline

    work = str(tmp_path_factory.mktemp("inv") / "kg")
    pipe = KGPipeline(spark, small_transcripts_path, work, run_id="r")
    pipe.run()
    links = pipe.store.read("links")
    from pyspark.sql import functions as F

    multi = (
        links.groupBy("surface")
        .agg(F.countDistinct("canonical_id").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert multi.count() == 0
