"""Feature ingest / export (SURVEY.md §2.1 src-features, snk-export)."""
