"""Training stack: losses, jitted train/eval steps, the trainer loop."""
