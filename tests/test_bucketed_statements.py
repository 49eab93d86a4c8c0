"""Bucketed statements store: statement-identity joins between two
predicate scans must be storage-partitioned (no Exchange in the plan) —
the 100 TB lever for the facts pipeline's subject↔statement↔value joins
(at scale they otherwise shuffle the full statement stream on stmt_key
for every build; bucketing pays that shuffle once at load)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yago4_spark.fixtures import mini_wikidata_df
from yago4_spark.sources.statements import StatementsTable

TABLE = "stmts_bucketed_test"


def test_bucketed_stmt_join_no_exchange(spark):
    import shutil

    df = mini_wikidata_df(spark)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    # a previously crashed run may leave the managed-table location behind
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{TABLE}", ignore_errors=True)
    StatementsTable.write_bucketed(df, TABLE, n_buckets=4)
    st = StatementsTable.from_table(spark, TABLE)

    # entity→statement rows join statement→value rows on stmt identity
    subj = st.scan_stmt(["p:P569"]).select(
        "stmt_key", F.col("subject.num").alias("qid"))
    vals = st.scan_stmt(["psv:P569"]).select(
        "stmt_key", F.col("object.text").alias("value_node"))
    joined = subj.hint("merge").join(vals, "stmt_key")

    rows = joined.collect()
    assert len(rows) > 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # the stmt_key column routing: p: rows keyed by OBJECT, psv: by SUBJECT
    got = {(r["stmt_key"], r["value_node"]) for r in rows}
    assert ("s42birth", "v42birth") in got
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
