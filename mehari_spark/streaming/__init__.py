"""Streaming ingest variant of the KG pipeline.

The reference is a batch engine (SURVEY.md §2.9) and so is our primary
pipeline; this module exists for continuous ingest deployments: new
transcript partitions land in the input table and triples append to the
output with exactly-once semantics via foreachBatch + checkpointLocation.
"""
