"""CLI entry points: train / enhance / evaluate / data prep."""
