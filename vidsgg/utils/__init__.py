"""Utilities: visualization, profiling."""
