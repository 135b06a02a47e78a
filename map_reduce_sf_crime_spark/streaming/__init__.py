"""Structured Streaming operators (SURVEY §2.9 — absent in the
batch-only reference; a first-class extension here per §7.5)."""
