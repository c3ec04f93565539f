"""Sensor acquisition: LiDAR scanner drivers, scan recording, camera capture."""

from icp_slam_yolo_tpu.acquisition.lidar import LidarScanner, ReplayLidar, ScanRecorder

__all__ = ["LidarScanner", "ReplayLidar", "ScanRecorder"]
