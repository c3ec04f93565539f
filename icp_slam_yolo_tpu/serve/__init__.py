"""HTTP serving surface: SLAM control panel with SSE/MJPEG streams."""
