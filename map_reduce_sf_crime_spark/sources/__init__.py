"""Readers and writers (SURVEY §2.1 S1-S4 / K1-K4)."""
