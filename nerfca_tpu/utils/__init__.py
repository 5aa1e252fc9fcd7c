"""Utilities: profiling, activation capture, geometry visualization."""
