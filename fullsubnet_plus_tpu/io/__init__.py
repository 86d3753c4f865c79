"""Checkpointing and PyTorch-reference checkpoint conversion."""
