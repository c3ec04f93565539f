"""Perception models: YOLO detector family (detect / OBB) in Flax, TPU-jitted."""
