"""YOLO label validation and repair (`check_labels.py:4-63` parity).

Scans ``*.txt`` label files for coordinates outside [0, 1]; with ``fix=True``
clamps offending values and rewrites the file (same clamp-and-rewrite repair
as the reference).  Also provides the reference labeler's multi-format label
writers (`labels_segmentation.py:61-139`): OBB polygon, pose (bbox +
keypoints + visibility) and plain object (cxcywh) rows.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class LabelReport:
    n_files: int
    n_bad: int
    messages: list[str]


def check_labels(directory: str, fix: bool = False) -> LabelReport:
    messages: list[str] = []
    n_files = 0
    n_bad = 0
    for root, _, files in os.walk(directory):
        for name in sorted(files):
            if not name.endswith(".txt"):
                continue
            path = os.path.join(root, name)
            n_files += 1
            fixed_lines = []
            bad = False
            with open(path) as f:
                for ln, line in enumerate(f, 1):
                    vals = line.split()
                    if not vals:
                        continue
                    cls, coords = vals[0], [float(v) for v in vals[1:]]
                    out = [c for c in coords if c < 0.0 or c > 1.0]
                    if out:
                        bad = True
                        messages.append(f"{path}:{ln}: {len(out)} coord(s) outside [0,1]")
                        coords = [min(max(c, 0.0), 1.0) for c in coords]
                    fixed_lines.append(" ".join([cls] + [f"{c:.6f}" for c in coords]))
            if bad:
                n_bad += 1
                if fix:
                    with open(path, "w") as f:
                        f.write("\n".join(fixed_lines) + "\n")
    return LabelReport(n_files=n_files, n_bad=n_bad, messages=messages)


# --- label writers (three formats at once, `labels_segmentation.py:61-139`) --

def polygon_row(cls: int, points_norm) -> str:
    """OBB/segmentation polygon: ``class x1 y1 x2 y2 ...`` normalised."""
    flat = " ".join(f"{v:.6f}" for xy in points_norm for v in xy)
    return f"{cls} {flat}"


def pose_row(cls: int, cxcywh_norm, keypoints_norm, visibility) -> str:
    """Pose: ``class cx cy w h kx1 ky1 v1 ...`` (`labels_segmentation.py:107-112`)."""
    box = " ".join(f"{v:.6f}" for v in cxcywh_norm)
    kps = " ".join(
        f"{x:.6f} {y:.6f} {int(v)}" for (x, y), v in zip(keypoints_norm, visibility)
    )
    return f"{cls} {box} {kps}"


def object_row(cls: int, cxcywh_norm) -> str:
    """Plain detect: ``class cx cy w h`` (`labels_segmentation.py:127-129`)."""
    return f"{cls} " + " ".join(f"{v:.6f}" for v in cxcywh_norm)


def polygon_to_cxcywh(points_norm):
    xs = [p[0] for p in points_norm]
    ys = [p[1] for p in points_norm]
    return (
        (min(xs) + max(xs)) / 2,
        (min(ys) + max(ys)) / 2,
        max(xs) - min(xs),
        max(ys) - min(ys),
    )


def write_all_formats(base_dirs: dict, stem: str, cls: int, points_norm) -> None:
    """Write one object into the three output trees the labeler maintains
    (`output/`, `output_pose/`, `output_oject/` in the reference)."""
    cxcywh = polygon_to_cxcywh(points_norm)
    rows = {
        "obb": polygon_row(cls, points_norm),
        "pose": pose_row(cls, cxcywh, points_norm, [2] * len(points_norm)),
        "object": object_row(cls, cxcywh),
    }
    for kind, row in rows.items():
        d = base_dirs.get(kind)
        if d is None:
            continue
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, stem + ".txt"), "a") as f:
            f.write(row + "\n")
