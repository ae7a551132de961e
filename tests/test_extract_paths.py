"""Round-6 optimization contract: the JVM-regex extraction path (the new
default — no Python boundary) must be row-identical to the Arrow-batched
pandas path (the retained §2.9 extension point) on the reference corpus,
including duplicate multiplicities."""

import pytest

from importtoneo4j_spark.datagen import TranscriptGenerator
from importtoneo4j_spark.operators.extract import (
    extract_assertions,
    extract_assertions_arrow,
)
from importtoneo4j_spark.sources.transcripts import (
    read_transcripts,
    split_valid_rejects,
    with_stable_order,
)


@pytest.fixture(scope="module")
def valid_turns(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("extract_paths") / "t")
    TranscriptGenerator(seed=7, n_entities=120).write_parquet(path, n_convs=80)
    raw = read_transcripts(spark, path)
    valid, _ = split_valid_rejects(raw)
    return with_stable_order(valid)


def test_jvm_and_arrow_paths_identical(valid_turns):
    jvm = extract_assertions(valid_turns)
    arrow = extract_assertions_arrow(valid_turns)
    # names + types must match exactly; nullability flags may differ (JVM
    # literal branches are provably non-null, the Arrow DDL is all-nullable)
    assert jvm.dtypes == arrow.dtypes
    n = jvm.count()
    assert n == arrow.count() and n > 0
    # exceptAll is multiset difference: equal in both directions means
    # row-identical including duplicate counts
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0


def test_jvm_path_has_no_python_node(valid_turns):
    plan = extract_assertions(valid_turns)._jdf.queryExecution().executedPlan().toString()
    for marker in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
