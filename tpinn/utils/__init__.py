"""tpinn.utils — artifacts, logging, checkpointing (numpy-only, no UI deps)."""
