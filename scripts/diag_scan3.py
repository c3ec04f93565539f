"""Diagnose scan_data_3 generalization: per-scan accept/rmse dump + cluster
analysis for both presets.  Writes /tmp/diag_scan3_<mode>.npz.

Usage: python scripts/diag_scan3.py [mode ...]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import icp_slam_yolo_tpu as slam
from icp_slam_yolo_tpu.io import scans as scans_io


def main():
    modes = sys.argv[1:] or ["realtime", "offline"]
    scans, _, _ = scans_io.load_sequence("/root/reference/scan_data_3", 0, 2043, n_max=512)
    cfgs = {"offline": slam.OFFLINE_CONFIG, "realtime": slam.REALTIME_CONFIG}
    for mode in modes:
        eng = slam.Slam(cfgs[mode])
        _, outs = eng.run(scans)
        acc = np.asarray(outs.accepted)
        rm = np.asarray(outs.rmse)
        pose = np.asarray(outs.pose)
        npts = np.asarray(outs.n_points)
        np.savez(f"/tmp/diag_scan3_{mode}.npz", acc=acc, rmse=rm, pose=pose, n_points=npts)
        fin = np.isfinite(rm)
        print(f"== {mode}: accept {acc.mean():.4f}  median rmse {np.median(rm[fin]):.2f} mm "
              f"map_points {len(eng.map_points())}")
        # rejection clusters: runs of consecutive rejections
        rej = ~acc
        idx = np.flatnonzero(rej)
        if len(idx):
            # group into runs
            runs = []
            s = idx[0]; p = idx[0]
            for i in idx[1:]:
                if i == p + 1:
                    p = i
                else:
                    runs.append((s, p)); s = p = i
            runs.append((s, p))
            runs.sort(key=lambda r: r[1] - r[0], reverse=True)
            print(f"   {len(idx)} rejected in {len(runs)} runs; longest:")
            for a, b in runs[:12]:
                seg = rm[a:b + 1]
                print(f"     scans {a+1}-{b+1} (len {b-a+1}) rmse med {np.median(seg[np.isfinite(seg)]) if np.isfinite(seg).any() else float('nan'):.1f} "
                      f"npts med {int(np.median(npts[a:b+1]))}")


if __name__ == "__main__":
    main()
