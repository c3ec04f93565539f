"""Multi-chip scaling: device meshes and fleet-batched SLAM."""
