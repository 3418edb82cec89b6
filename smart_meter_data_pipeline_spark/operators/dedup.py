"""Placeholder — filled in by the LLM-pipeline milestone."""
