"""Plan inspection helpers (explain/pushdown assertions for tests)."""
