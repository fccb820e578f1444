"""Host-side utilities: display, files, checkpoints."""
