"""Operator implementations for every SURVEY §2 inventory row."""
