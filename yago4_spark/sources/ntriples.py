"""N-Triples source & sink — the ingest/egress boundary.

Reference behaviors re-expressed Spark-first:
- ``load_ntriples`` (src/partitioned_statements.rs:82-128): streaming
  gzip parse → RocksDB (P,S,O) keys. Here: ``spark.read.text`` (splittable
  across executors for uncompressed input; gzip files parallelize per
  file) → Arrow-batched parse in ``mapInPandas`` → statements DataFrame
  with a ``predicate_key`` partition column. Lenient: malformed lines are
  dropped, like the reference's printed-and-skipped errors (:119-121).
- ``NTriplesWriter`` (src/plan.rs:2314-2348): gzip .nt writer. Here: the
  whole serialization is a JVM-side column expression (term_to_nt_col)
  and the write is ``df.write.text(..., compression="gzip")`` — one file
  per partition, so the sink scales with the cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .. import terms

PARSED_SCHEMA = StructType(
    [
        StructField("subject", terms.TERM_SCHEMA),
        StructField("predicate", terms.TERM_SCHEMA),
        StructField("object", terms.TERM_SCHEMA),
    ]
)


def read_ntriples(spark: SparkSession, path: str, seed: str = "") -> DataFrame:
    """Parse N-Triples text into a statements DataFrame
    (subject, predicate, object term structs + predicate_key)."""
    lines = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                t
                for t in (terms.parse_nt_line(ln, seed) for ln in pdf["value"])
                if t is not None
            ]
            yield pd.DataFrame(rows, columns=["subject", "predicate", "object"])

    parsed = lines.mapInPandas(parse, PARSED_SCHEMA)
    return parsed.withColumn(
        "predicate_key", terms.predicate_key_col(F.col("predicate"))
    )


def triples_to_nt_lines(df: DataFrame) -> DataFrame:
    """Serialize (subject, predicate, object[, annotation_predicate,
    annotation_object]) term-struct columns to N-Triples / N-Triples-star
    lines. RDF★ rows (annotated facts) use the ``<< s p o >> ap ao .``
    embedded-triple syntax (src/model.rs:51-63)."""
    s = terms.term_to_nt_col(F.col("subject"))
    p = terms.term_to_nt_col(F.col("predicate"))
    o = terms.term_to_nt_col(F.col("object"))
    if "annotation_predicate" in df.columns:
        ap = terms.term_to_nt_col(F.col("annotation_predicate"))
        ao = terms.term_to_nt_col(F.col("annotation_object"))
        line = F.when(
            F.col("annotation_predicate").isNotNull(),
            F.concat_ws(" ", F.lit("<<"), s, p, o, F.lit(">>"), ap, ao, F.lit(".")),
        ).otherwise(F.concat_ws(" ", s, p, o, F.lit(".")))
    else:
        line = F.concat_ws(" ", s, p, o, F.lit("."))
    return df.select(line.alias("value"))


def write_ntriples(df: DataFrame, path: str, gzip: bool = True) -> None:
    writer = triples_to_nt_lines(df).write.mode("overwrite")
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.text(path)
