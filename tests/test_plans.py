"""Physical-plan quality gates: predicate pushdown reaches the parquet
scan, column pruning works, dimension joins broadcast, and NO Python UDF
appears in any hot path. These assertions keep the 100 TB properties
from regressing silently."""

from __future__ import annotations

import os
import re

import pytest

import __spark_entry__ as em

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark):
    plan = plan_of(em.q_lineitem_scan(spark, SF))
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(l_returnflag,R\)", plan)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # only the 4 referenced columns are read, not all 11
    assert cols == {"l_orderkey", "l_partkey", "l_quantity", "l_returnflag"}


def test_dim_joins_broadcast(spark):
    plan = plan_of(em.q_revenue_by_nation(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_statements_scan_partition_pruned(spark, tmp_path):
    from yago4_spark.fixtures import write_mini_wikidata
    from yago4_spark.sources.statements import StatementsTable

    path = str(tmp_path / "stmts")
    write_mini_wikidata(spark, path)
    plan = plan_of(StatementsTable(spark, path).scan("wdt:P279"))
    assert re.search(r"PartitionFilters: \[[^\]]*predicate_key[^\]]*wdt:P279",
                     plan)


@pytest.mark.parametrize("qname", [
    "lineitem_scan", "revenue_by_nation", "customers_min_orders",
    "top_orders_per_customer", "doc_text_stats", "doc_lang_id",
    "dedup_minhash_lsh", "ann_cosine_topk", "mention_candidates",
    "doc_simhash", "events_hourly",
])
def test_no_python_in_hot_paths(spark, qname):
    plan = plan_of(em.queries()[qname](spark, SF))
    assert "PythonUDF" not in plan, f"{qname} fell back to Python"
    assert "BatchEvalPython" not in plan


def test_linking_single_exchange_for_agg_and_join(spark):
    """The whole linking pipeline shuffles ONCE, on the raw span text
    (doc_id): the argmax agg and the containment window both reuse that
    clustering — no exchange of the (wider) candidate stream."""
    from yago4_spark.operators.linking import extract_and_link
    from yago4_spark.sources.documents import documents_df, qid_dictionary_df

    df = extract_and_link(documents_df(spark, 20), qid_dictionary_df(spark))
    plan = plan_of(df)
    # dictionary joins broadcast; only hash-partition exchanges remain
    assert "BroadcastHashJoin" in plan
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges <= 1, f"too many shuffles: {n_exchanges}\n{plan[:2000]}"


def test_grouped_facts_scans_partition_pruned(spark, tmp_path):
    """The branch-grouped facts scans (predicate_key IN (...) + broadcast
    sid config) must still prune statement partitions — the sid join must
    not defeat partition filters."""
    from yago4_spark.fixtures import write_mini_wikidata
    from yago4_spark.plans.facts import _scan_with_sids
    from yago4_spark.plans.shapes import sample_schema
    from yago4_spark.sources.statements import StatementsTable

    path = str(tmp_path / "stmts_g")
    write_mini_wikidata(spark, path)
    st = StatementsTable(spark, path)
    schema = sample_schema(2)
    sid_shapes = [(i, s) for i, s in enumerate(schema.property_shapes)
                  if s.from_properties][:4]
    plan = plan_of(_scan_with_sids(spark, st, sid_shapes, "ps"))
    assert re.search(r"PartitionFilters: \[[^\]]*predicate_key", plan)
    # the sid config side is broadcast, not shuffled
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
