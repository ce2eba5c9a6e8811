"""Sources: deterministic synthetic inputs + decoders (receiver analogs)."""
