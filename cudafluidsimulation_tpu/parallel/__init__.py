"""Multi-chip scaling: mesh construction, sharded stepping, halo exchange."""
