"""Host-side utilities: CSV IO, metrics, experiment journal."""
