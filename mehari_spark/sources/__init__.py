"""Sources: parquet readers + the deterministic transcripts derivation.

At production scale these would be Iceberg tables
(``spark.read.table("transcripts")``); the Iceberg runtime jar is not in this
sandbox image, so parquet stands in. Partition pruning / pushdown semantics
are identical.
"""
