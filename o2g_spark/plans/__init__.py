"""Stage-level planning: checkpoint manifests, lineage, resume."""

from .checkpoint import CheckpointManager, lineage_rows  # noqa: F401
