"""Spark-facing operators: cell indexing, spatial joins, overlay, scoring,
kNN, range joins, salting, tiling — the SURVEY.md §2.3 inventory."""
