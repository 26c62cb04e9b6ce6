"""Logical plans: the end-to-end pipeline, lineage/checkpointing, and the
driver-facing query registry."""
