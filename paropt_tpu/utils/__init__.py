"""Options registry, logging contract, checkpointing, plotting."""
