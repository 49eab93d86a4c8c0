"""Relational + graph operators (SURVEY.md §2.3-2.6) and the
training-data-pipeline extensions (dedup, similarity, linking)."""
