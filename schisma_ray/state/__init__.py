"""Checkpoint / lineage records for resumable partitioned runs."""

from .checkpoint import (  # noqa: F401
    committed_partitions,
    load_records,
    partition_inputs,
    run_resumable,
)
