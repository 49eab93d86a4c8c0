"""End-to-end tests for URI mapping → taxonomy → shape instances on the
deterministic mini-Wikidata fixture. Goldens hand-computed from the
reference rules (src/plan.rs:206-731); see yago4_spark/fixtures.py for
the universe design.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yago4_spark import vocab
from yago4_spark.fixtures import write_mini_wikidata
from yago4_spark.plans.instances import build_shape_instances
from yago4_spark.plans.shapes import sample_schema
from yago4_spark.plans.taxonomy import build_taxonomy
from yago4_spark.plans.uri_mapping import (
    YagoSize,
    build_uri_mapping,
    items_to_keep,
    wikidata_to_enwiki_mapping,
)
from yago4_spark.sources.statements import StatementsTable

Y = "http://yago-knowledge.org/resource/"
S = vocab.SCHEMA


@pytest.fixture(scope="module")
def st(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mini_wd") / "statements")
    write_mini_wikidata(spark, path)
    return StatementsTable(spark, path)


@pytest.fixture(scope="module")
def schema():
    return sample_schema(min_instances=2)


@pytest.fixture(scope="module")
def uri_map(spark, st, schema):
    return build_uri_mapping(spark, st, schema, YagoSize.FULL).persist()


@pytest.fixture(scope="module")
def taxonomy(spark, st, schema, uri_map):
    enwiki = wikidata_to_enwiki_mapping(st)
    return build_taxonomy(spark, st, schema, uri_map, enwiki)


def mapping_dict(uri_map):
    return {r["qid"]: r["yago"] for r in uri_map.collect()}


def test_uri_mapping_priorities(uri_map):
    m = mapping_dict(uri_map)
    # priority 0: schema mapping
    assert m[5] == S + "Person"
    assert m[35120] == S + "Thing"
    assert m[618123] == S + "Place"
    # priority 1: enwiki title (beats the label Q42 also has)
    assert m[42] == Y + "Douglas_Adams"
    # percent-decoded then reference-encoded title
    assert m[2004] == Y + "Paris_Hilton%2FBio"
    # priority 2: english label + _Q suffix (no enwiki)
    assert m[2002] == Y + "Dürst_Q2002"
    assert m[2005] == Y + "Max_Muster_Q2005"  # de-wiki only
    assert m[2010] == Y + "Sci_2010_Q2010"
    # priority 3: fallback (only fr label)
    assert m[2003] == Y + "_Q2003"
    # every item got exactly one URI
    assert uri_map.groupBy("qid").count().where("count > 1").count() == 0


def test_size_filters(spark, st):
    full = {r["qid"] for r in items_to_keep(spark, st, YagoSize.FULL).collect()}
    allw = {
        r["qid"]
        for r in items_to_keep(spark, st, YagoSize.ALL_WIKIPEDIAS).collect()
    }
    enw = {
        r["qid"]
        for r in items_to_keep(spark, st, YagoSize.ENGLISH_WIKIPEDIA).collect()
    }
    assert 2003 in full and 2003 not in allw  # label-only item
    assert 2005 in allw and 2005 not in enw  # de-wiki item
    assert 42 in enw
    # mandatory items always kept (plan.rs:280-282)
    for s in (full, allw, enw):
        assert vocab.Q_MALE in s and vocab.Q_FEMALE in s


def test_yago_classes(taxonomy):
    got = {r["cls"] for r in taxonomy.yago_classes.collect()}
    assert got == {
        S + "Person", S + "Thing", S + "Place", S + "CreativeWork",
        S + "Organization",
        Y + "Scientist", Y + "Physicist", Y + "CycleA", Y + "CycleB",
    }
    # bad subtree (Q1200), disjoint subclass (Q1300), no-enwiki (Q1400),
    # below-threshold (Q1002), orphan (Q1500) are all absent
    for bad in (Y + "BadSub", Y + "DisjointSub", Y + "Villagetype_Q1400"):
        assert bad not in got


def test_super_class_of_reduced(taxonomy):
    got = {(r["child"], r["parent"]) for r in taxonomy.sub_class_of.collect()}
    assert got == {
        (Y + "Scientist", S + "Person"),
        (Y + "Physicist", S + "Person"),
        (Y + "CycleA", S + "Person"),
        (Y + "CycleB", S + "Person"),
        (S + "Person", S + "Thing"),
        (S + "Place", S + "Thing"),
        (S + "CreativeWork", S + "Thing"),
        (S + "Organization", S + "Thing"),
    }
    # in particular: Scientist→Thing (redundant via Person) was reduced away
    assert (Y + "Scientist", S + "Thing") not in got


def test_class_mapping(taxonomy):
    got = {(r["qid"], r["cls"]) for r in taxonomy.class_mapping.collect()}
    assert got == {
        (5, S + "Person"), (35120, S + "Thing"), (618123, S + "Place"),
        (17537576, S + "CreativeWork"), (43229, S + "Organization"),
        (1000, Y + "Scientist"), (1001, Y + "Physicist"),
        (1100, Y + "CycleA"), (1101, Y + "CycleB"),
        # kept-but-no-enwiki class maps up to its schema.org ancestor
        (1400, S + "Place"),
    }


EXPECTED_PERSONS = (
    {Y + "Douglas_Adams", Y + "Dürst_Q2002", Y + "_Q2003",
     Y + "Paris_Hilton%2FBio", Y + "Max_Muster_Q2005"}
    | {Y + f"Hub_{q}_Q{q}" for q in range(6000, 6040)}
    | {Y + f"Sci_{q}_Q{q}" for q in (2010, 2011, 2012)}
    | {Y + f"Phys_{q}_Q{q}" for q in (2020, 2021)}
    | {Y + f"CycA_{q}_Q{q}" for q in (2110, 2111)}
    | {Y + f"CycB_{q}_Q{q}" for q in (2120, 2121)}
)


@pytest.fixture(scope="module")
def shape_instances(spark, st, schema, taxonomy, uri_map):
    return build_shape_instances(spark, st, schema, taxonomy, uri_map).persist()


def test_shape_instances_person(shape_instances):
    got = {
        r["instance"]
        for r in shape_instances.where(F.col("shape") == S + "Person").collect()
    }
    assert got == EXPECTED_PERSONS
    # the disjoint-intersection instance (Q3100) is gone
    assert Y + "Androgyne_Opus_Q3100" not in got


def test_shape_instances_other(shape_instances):
    place = {
        r["instance"]
        for r in shape_instances.where(F.col("shape") == S + "Place").collect()
    }
    assert place == {
        Y + "Berlin", Y + "Lake_Town_Q2042",
        Y + "Village_2040_Q2040", Y + "Village_2041_Q2041",
    }
    cw = {
        r["instance"]
        for r in shape_instances.where(
            F.col("shape") == S + "CreativeWork"
        ).collect()
    }
    # Q1100 (a yago class) and Q3100 (disjoint intersection) excluded
    assert cw == {Y + "Work_One", Y + "Work_Two_Q2051"}
    thing = shape_instances.where(F.col("shape") == S + "Thing").count()
    assert thing == len(EXPECTED_PERSONS) + 4 + 2 + 2
