"""SLAM x perception fusion: detections as semantic landmarks in the map frame."""

from icp_slam_yolo_tpu.fusion.landmarks import Landmark, LandmarkMap, project_detection

__all__ = ["Landmark", "LandmarkMap", "project_detection"]
