"""Benchmark problem families (the reference examples as models)."""
