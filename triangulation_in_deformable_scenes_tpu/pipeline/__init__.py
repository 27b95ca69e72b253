"""End-to-end pipelines (system facades): simulation and image sequences."""
