"""Multi-chip scaling: mesh-sharded scanning over ICI/DCN."""
