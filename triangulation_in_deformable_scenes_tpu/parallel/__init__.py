"""Multi-chip execution: landmark sharding, distributed matrix-free LM."""
