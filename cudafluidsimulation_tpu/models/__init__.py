"""Solver pipelines and the simulation harness."""
