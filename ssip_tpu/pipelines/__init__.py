"""Workload pipelines: extraction, training, analysis — the CLI backends."""
