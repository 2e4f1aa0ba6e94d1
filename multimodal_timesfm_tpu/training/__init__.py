"""Training/eval runtime (L4): jit-compiled train/eval steps, schedules, checkpointing."""
