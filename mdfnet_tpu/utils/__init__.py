"""Utilities: reference-checkpoint import, logging, profiling."""
