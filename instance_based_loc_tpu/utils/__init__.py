"""Host utilities: logging, metrics, PLY I/O."""
