"""Low-level TPU ops: geometry, nearest-neighbour, Kabsch, voxel, raster, NMS."""
