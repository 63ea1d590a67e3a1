"""Utilities: phase timing, field dumps, device info."""
