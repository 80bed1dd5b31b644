"""Run state: per-partition checkpoint manifest + lineage counters."""

from pypdfium2_ray.state.checkpoint import (  # noqa: F401
    CheckpointManifest, run_checkpointed, shard_inputs,
)
