"""Benchmark harness for ssip_tpu (shared machinery in benchmarks.common)."""
