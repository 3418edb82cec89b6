"""Placeholder — filled in by the streaming milestone."""
