"""Multi-chip scaling: device meshes, sharded detection and training."""
