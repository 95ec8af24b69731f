"""Checkpointed, resumable pipeline runner (manifest + lineage + metrics)."""
