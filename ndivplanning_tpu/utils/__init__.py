"""Config, checkpointing, metrics, PRNG utilities (SURVEY.md §2 C11-C13, L9)."""
