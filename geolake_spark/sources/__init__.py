"""Data sources: deterministic synthetic generators + driver-testdata loaders."""
