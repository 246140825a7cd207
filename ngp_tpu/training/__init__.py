"""L4: trainer, metrics, checkpointing, EMA."""
