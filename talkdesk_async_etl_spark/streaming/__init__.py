"""Streaming operators: batch twins (oracle-checkable) + readStream wrappers."""
