"""Statistical differential test: the full pipeline on a seeded ~20k-
entity synthetic slice vs the pure-Python oracle (fixtures_large.py).
Exact set compare (P/R must be 1.0) for URI mapping, taxonomy, class
mapping, hierarchy, shape instances, all 9 facts dispatch branches +
RDF★, and the classes / simple+full types / labels / same_as output
families at volume — closure depth, instance thresholds, disjoint
pruning, hub skew and sh:maxCount all active.

The 100k-entity version of the same check runs via
scripts/differential_report.py (results in BASELINE_RESULTS.md).
"""

from __future__ import annotations

import os

import pytest

from yago4_spark import terms, vocab
from yago4_spark.fixtures_large import compute_oracle, generate, statements_df
from yago4_spark.pipeline import run_pipeline
from yago4_spark.sources.statements import StatementsTable

N_ENTITIES = int(os.environ.get("SPARK_GRAFT_LARGE_N", "20000"))


@pytest.fixture(scope="module")
def diff(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("large")
    gt = generate(n_entities=N_ENTITIES, n_classes=400)
    oracle = compute_oracle(gt)
    StatementsTable.write(statements_df(spark, gt), str(base / "statements"))
    res = run_pipeline(
        spark, str(base / "statements"), str(base / "work"), gt.schema
    )
    return gt, oracle, res


@pytest.mark.slow
def test_uri_mapping(diff):
    _, oracle, res = diff
    got = {
        r["qid"]: r["yago"]
        for r in res.catalog.read("uri_mapping").collect()
    }
    assert got == oracle.uri


@pytest.mark.slow
def test_taxonomy(diff):
    _, oracle, res = diff
    got_classes = {r["cls"] for r in res.catalog.read("yago_classes").collect()}
    assert got_classes == oracle.yago_classes
    got_mapping = {
        (r["qid"], r["cls"])
        for r in res.catalog.read("class_mapping").collect()
    }
    assert got_mapping == oracle.class_mapping
    got_sub = {
        (r["child"], r["parent"])
        for r in res.catalog.read("sub_class_of").collect()
    }
    assert got_sub == oracle.sub_class_of


@pytest.mark.slow
def test_shape_instances(diff):
    _, oracle, res = diff
    rows = res.catalog.read("shape_instances").collect()
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r["shape"], set()).add(r["instance"])
    for shape, expected in oracle.instances.items():
        assert got.get(shape, set()) == expected, shape


REF_DATA = "/root/reference/src/data"
REF_FILES = ["schema.ttl", "shapes.ttl", "bioschemas.ttl", "shapes-bio.ttl"]


@pytest.fixture(scope="module")
def diff_real(spark, tmp_path_factory):
    """Same differential, driven by the REAL 268-shape reference config."""
    if not all(os.path.exists(f"{REF_DATA}/{f}") for f in REF_FILES):
        pytest.skip("reference config not present")
    from yago4_spark.plans.ttl import load_schema

    schema = load_schema([f"{REF_DATA}/{f}" for f in REF_FILES],
                         min_instances=10)
    base = tmp_path_factory.mktemp("large_real")
    gt = generate(n_entities=2000, n_classes=200, schema=schema)
    oracle = compute_oracle(gt)
    StatementsTable.write(statements_df(spark, gt), str(base / "statements"))
    res = run_pipeline(
        spark, str(base / "statements"), str(base / "work"), schema
    )
    return gt, oracle, res


@pytest.mark.slow
def test_real_config_differential(diff_real):
    """Full pipeline under the real 268-shape config vs the oracle:
    URI mapping, taxonomy, all 268 shape-instance sets, all generated
    facts branches, and the 5 other output families must match exactly."""
    _, oracle, res = diff_real
    got_uri = {r["qid"]: r["yago"]
               for r in res.catalog.read("uri_mapping").collect()}
    assert got_uri == oracle.uri
    got_cls = {r["cls"] for r in res.catalog.read("yago_classes").collect()}
    assert got_cls == oracle.yago_classes
    got_map = {(r["qid"], r["cls"])
               for r in res.catalog.read("class_mapping").collect()}
    assert got_map == oracle.class_mapping
    got_inst: dict[str, set] = {}
    for r in res.catalog.read("shape_instances").collect():
        got_inst.setdefault(r["shape"], set()).add(r["instance"])
    for shape, expected in oracle.instances.items():
        assert got_inst.get(shape, set()) == expected, shape
    got = _collect_facts(res, oracle)
    assert got == oracle.facts, (
        f"spark-only={sorted(got - oracle.facts)[:3]} "
        f"oracle-only={sorted(oracle.facts - got)[:3]}")
    assert _collect_annotated(res) == oracle.annotated
    for name, expected in (
        ("classes", oracle.classes_out),
        ("simple_types", oracle.simple_types),
        ("full_types", oracle.full_types),
        ("labels", oracle.labels_out),
        ("same_as", oracle.same_as),
    ):
        got_f = _spo(res.outputs[name])
        assert got_f == expected, (
            f"{name}: spark-only={sorted(got_f - expected)[:3]} "
            f"oracle-only={sorted(expected - got_f)[:3]}")


def _collect_facts(res, oracle):
    preds = {p for (_, p, _) in oracle.facts}
    got = set()
    for r in res.outputs["facts"].collect():
        pred = r["predicate"]["text"]
        if pred in preds:
            got.add((
                r["subject"]["text"], pred,
                terms.term_to_nt_py(r["object"].asDict()),
            ))
    return got


def _collect_annotated(res):
    got = set()
    for r in res.outputs["annotated_facts"].collect():
        if r["annotation_predicate"] is None:
            continue
        got.add((
            r["subject"]["text"], r["predicate"]["text"],
            terms.term_to_nt_py(r["object"].asDict()),
            r["annotation_predicate"]["text"],
            terms.term_to_nt_py(r["annotation_object"].asDict()),
        ))
    return got


@pytest.mark.slow
def test_facts_pr(diff):
    """All 9 dispatch branches (dates, object-range, anyURI, geo+sides,
    integer, duration, full quantity+sides, commons image, sh:pattern
    string) at volume."""
    _, oracle, res = diff
    got = _collect_facts(res, oracle)
    tp = len(got & oracle.facts)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(oracle.facts) if oracle.facts else 0.0
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall} "
        f"spark-only={sorted(got - oracle.facts)[:3]} "
        f"oracle-only={sorted(oracle.facts - got)[:3]}"
    )


@pytest.mark.slow
def test_annotated_facts(diff):
    """RDF★: start-date qualifiers attach to exactly the surviving
    spouse facts."""
    _, oracle, res = diff
    got = _collect_annotated(res)
    assert got == oracle.annotated, (
        f"spark-only={sorted(got - oracle.annotated)[:3]} "
        f"oracle-only={sorted(oracle.annotated - got)[:3]}")


def _spo(df):
    return {
        (r["subject"]["text"], r["predicate"]["text"],
         terms.term_to_nt_py(r["object"].asDict()))
        for r in df.collect()
    }


@pytest.mark.slow
def test_output_families(diff):
    """VERDICT r02 item 3: the remaining output families at volume —
    classes-description, simple/full types, labels, same_as — exact vs
    the oracle."""
    _, oracle, res = diff
    for name, expected in (
        ("classes", oracle.classes_out),
        ("simple_types", oracle.simple_types),
        ("full_types", oracle.full_types),
        ("labels", oracle.labels_out),
        ("same_as", oracle.same_as),
    ):
        got = _spo(res.outputs[name])
        assert got == expected, (
            f"{name}: spark-only={sorted(got - expected)[:3]} "
            f"oracle-only={sorted(expected - got)[:3]}")
