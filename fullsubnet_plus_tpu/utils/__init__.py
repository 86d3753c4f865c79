"""Config loading, logging, misc helpers."""
