"""Solver drivers: V-cycle (linear + FAS) and the outer Newton iteration."""
