"""Triple-emission precision/recall report — the BASELINE.json headline
metric (P/R >= 0.95 vs the reference on a shared slice).

This sandbox has no network and cannot run the Rust reference, so the
comparison set is the hand-computed golden triples derived rule-by-rule
from the reference sources (every rule cited in tests/test_facts.py and
yago4_spark/fixtures.py). At fixture scale the pipeline must emit the
golden set EXACTLY → P = R = 1.0; any drift prints the differences.

Usage: python scripts/pr_report.py  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yago4_spark.session import get_spark  # noqa: E402


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import test_facts as tf  # reuse the golden set + collector

    from yago4_spark.fixtures import write_mini_wikidata
    from yago4_spark.plans.facts import build_facts
    from yago4_spark.plans.instances import build_shape_instances
    from yago4_spark.plans.shapes import sample_schema
    from yago4_spark.plans.taxonomy import build_taxonomy
    from yago4_spark.plans.uri_mapping import (
        YagoSize,
        build_uri_mapping,
        wikidata_to_enwiki_mapping,
    )
    from yago4_spark.sources.statements import StatementsTable

    spark = get_spark(app_name="pr-report", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "statements")
        write_mini_wikidata(spark, path)
        st = StatementsTable(spark, path)
        schema = sample_schema(min_instances=2)
        uri = build_uri_mapping(spark, st, schema, YagoSize.FULL).persist()
        tax = build_taxonomy(spark, st, schema, uri,
                             wikidata_to_enwiki_mapping(st))
        insts = build_shape_instances(spark, st, schema, tax, uri).persist()
        res = build_facts(spark, st, schema, insts, uri)
        got = tf.collect_triples(res.facts)

    want = tf.EXPECTED_FACTS
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    print(json.dumps({
        "metric": "triple_emission_pr_vs_reference_rules",
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "emitted": len(got),
        "expected": len(want),
        "target": 0.95,
        "pass": precision >= 0.95 and recall >= 0.95,
        "note": "golden set derived rule-by-rule from reference sources "
                "(see tests/test_facts.py citations); sandbox cannot run "
                "the Rust binary itself",
    }))
    if got != want:
        print("missing:", sorted(want - got)[:5], file=sys.stderr)
        print("extra:", sorted(got - want)[:5], file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
