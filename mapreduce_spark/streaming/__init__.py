"""Structured Streaming operators (see events.py)."""
