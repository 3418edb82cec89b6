"""Placeholder — filled in by the meter-parity milestone."""
