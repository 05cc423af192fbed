"""Checkpoint / resume state layout (reference S3 index persistence analog)."""
