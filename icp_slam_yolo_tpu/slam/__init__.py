"""SLAM state, per-scan step, sequence runner, offline replayer."""
