"""Per-host input pipeline: WAV I/O, dynamic mixing, datasets, loader."""
