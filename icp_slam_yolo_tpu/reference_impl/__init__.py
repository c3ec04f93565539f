"""Pure-NumPy oracle implementations used as golden references in tests/bench."""
