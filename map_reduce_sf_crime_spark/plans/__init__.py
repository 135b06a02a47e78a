"""Query registry — the engine's public query surface."""
