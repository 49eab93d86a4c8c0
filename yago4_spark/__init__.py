"""yago4_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the capabilities of the YAGO4 builder (yago-naga/yago4).

The reference (/root/reference, Rust, 4k LoC) is a single-machine batch ETL
over RocksDB; this package re-expresses the same semantics as staged
DataFrame jobs designed for a multi-executor cluster at 10^12-document
scale:

- ``terms``      — the 11-variant RDF term model as one flat StructType
                   (reference: src/model.rs:67-80)
- ``sources``    — N-Triples parse/serialize (Arrow-vectorized), the
                   predicate-partitioned ``statements`` table (reference:
                   src/partitioned_statements.rs), interleaved-document
                   input per BASELINE.json input_hint
- ``operators``  — transitive closure, priority union, maxCount group
                   filter, salted two-phase aggregation, dedup family,
                   similarity search, entity linking
- ``functions``  — IRI path encoding, value converters (time/geo/quantity/
                   duration), text analysis
- ``plans``      — the staged pipeline (URI mapping, taxonomy, shape
                   instances, facts, outputs) mirroring src/plan.rs
- ``fixtures``   — deterministic (seed=42) synthetic mini-Wikidata slice
                   + interleaved documents for tests and benchmarks
"""

__version__ = "0.1.0"
