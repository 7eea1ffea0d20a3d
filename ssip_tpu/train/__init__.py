"""Training engine: jitted train/eval steps, epoch driver, checkpoints."""
