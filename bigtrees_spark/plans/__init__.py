"""Pipeline assembly and run metadata (checkpoint/resume, metrics)."""
