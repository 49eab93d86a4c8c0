"""Scalar function library (SURVEY.md §2.7): IRI encoding, value
converters, text analysis. Everything is either a built-in-functions
column expression (JVM-side) or an Arrow-vectorized pandas UDF — never
row-at-a-time Python."""
