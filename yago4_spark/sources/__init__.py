"""Sources & sinks (SURVEY.md §2.1): N-Triples in/out, the
predicate-partitioned statements table, interleaved document input."""
