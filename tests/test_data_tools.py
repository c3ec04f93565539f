"""Data toolchain: label validation/repair, dataset split, CSV helpers,
checkpointing, fusion landmarks."""

import os

import numpy as np
from PIL import Image

from icp_slam_yolo_tpu.config import MapConfig
from icp_slam_yolo_tpu.data.csvutil import comma_table, tab_table
from icp_slam_yolo_tpu.data.labels import check_labels, polygon_to_cxcywh, write_all_formats
from icp_slam_yolo_tpu.data.split import split_dataset
from icp_slam_yolo_tpu.fusion import LandmarkMap, project_detection


def test_check_labels_detects_and_fixes(tmp_path):
    good = tmp_path / "good.txt"
    good.write_text("0 0.5 0.5 0.2 0.2\n")
    bad = tmp_path / "bad.txt"
    bad.write_text("0 1.5 0.5 0.2 -0.1\n")
    report = check_labels(str(tmp_path))
    assert report.n_files == 2 and report.n_bad == 1
    assert "bad.txt" in report.messages[0]

    report = check_labels(str(tmp_path), fix=True)
    vals = [float(v) for v in bad.read_text().split()[1:]]
    assert max(vals) <= 1.0 and min(vals) >= 0.0
    assert check_labels(str(tmp_path)).n_bad == 0


def test_split_dataset(tmp_path):
    src = tmp_path / "src"
    (src / "images").mkdir(parents=True)
    (src / "labels").mkdir()
    for i in range(10):
        Image.new("RGB", (8, 8)).save(src / "images" / f"img{i}.jpg")
        (src / "labels" / f"img{i}.txt").write_text("0 0.5 0.5 0.1 0.1\n")
    out = tmp_path / "out"
    n_train, n_val = split_dataset(str(src), str(out), train_ratio=0.8, seed=42)
    assert (n_train, n_val) == (8, 2)
    assert len(os.listdir(out / "train" / "images")) == 8
    assert len(os.listdir(out / "val" / "labels")) == 2
    # determinism at seed 42 (`chia.py` parity)
    out2 = tmp_path / "out2"
    split_dataset(str(src), str(out2), train_ratio=0.8, seed=42)
    assert sorted(os.listdir(out / "train" / "images")) == sorted(os.listdir(out2 / "train" / "images"))


def test_label_writers(tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("obb", "pose", "object")}
    poly = [(0.1, 0.2), (0.3, 0.2), (0.3, 0.4), (0.1, 0.4)]
    write_all_formats(dirs, "frame1", 0, poly)
    obb = (tmp_path / "obb" / "frame1.txt").read_text().split()
    assert obb[0] == "0" and len(obb) == 9
    pose = (tmp_path / "pose" / "frame1.txt").read_text().split()
    assert len(pose) == 1 + 4 + 4 * 3  # class + box + 4*(x, y, vis)
    obj = (tmp_path / "object" / "frame1.txt").read_text().split()
    cx, cy, w, h = polygon_to_cxcywh(poly)
    np.testing.assert_allclose([float(v) for v in obj[1:]], [cx, cy, w, h], atol=1e-6)


def test_labelimg_formats(tmp_path):
    from icp_slam_yolo_tpu.data.labels import (
        read_voc_xml,
        write_createml_json,
        write_voc_xml,
        write_yolo_txt,
    )

    objects = [("pallet", (10.0, 20.0, 110.0, 70.0)), ("box", (200.0, 50.0, 260.0, 120.0))]
    xml = tmp_path / "img1.xml"
    write_voc_xml(str(xml), "img1.jpg", (640, 480), objects)
    name, dims, back = read_voc_xml(str(xml))
    assert name == "img1.jpg" and dims == (640, 480)
    assert back[0][0] == "pallet" and back[0][1] == (10.0, 20.0, 110.0, 70.0)

    import json

    cjson = tmp_path / "anns.json"
    write_createml_json(str(cjson), [("img1.jpg", objects)])
    data = json.loads(cjson.read_text())
    ann = data[0]["annotations"][0]
    assert ann["coordinates"] == {"x": 60.0, "y": 45.0, "width": 100.0, "height": 50.0}

    txt = tmp_path / "img1.txt"
    write_yolo_txt(str(txt), (640, 480), objects, ["pallet", "box"])
    rows = txt.read_text().strip().split("\n")
    assert rows[0].startswith("0 ") and rows[1].startswith("1 ")
    vals = [float(v) for v in rows[0].split()[1:]]
    assert abs(vals[0] - 60 / 640) < 1e-6 and abs(vals[2] - 100 / 640) < 1e-6


def test_cli_register(tmp_path, capsys):
    import numpy as np

    from icp_slam_yolo_tpu.cli import main

    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 130, 200)
    tgt = np.stack([np.full(200, 40.0), ang, 3000 + 300 * np.sin(np.deg2rad(ang) * 5)], axis=1)
    src = tgt.copy()
    src[:, 2] += 20.0  # radially shifted copy
    np.save(tmp_path / "a.npy", tgt)
    np.save(tmp_path / "b.npy", src)
    main(["register", str(tmp_path / "b.npy"), str(tmp_path / "a.npy"),
          "--output", str(tmp_path / "ov.png")])
    out = capsys.readouterr().out
    import json

    res = json.loads(out.strip().split("\n")[0])
    assert res["rmse_mm"] < 50
    assert (tmp_path / "ov.png").exists()


def test_csv_tables(tmp_path):
    t = comma_table(str(tmp_path / "a.csv"), header=["name", "x", "y"])
    t.append(["p1", "1", "2"])
    t.append(["p2", "3", "4"])
    assert t.column(0) == ["name", "p1", "p2"]
    t.edit_cell(1, 1, "9")
    assert t.read_rows()[1] == ["p1", "9", "2"]
    assert t.find_rows(0, "p2") == [2]
    t.delete_row(2)
    assert len(t.read_rows()) == 2

    tt = tab_table(str(tmp_path / "b.tsv"))
    tt.append(["a", "b"])
    assert "\t" in (tmp_path / "b.tsv").read_text()


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from icp_slam_yolo_tpu.models.yolo import YOLO

    model = YOLO(num_classes=1)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    path = str(tmp_path / "model.msgpack")
    save_checkpoint(path, variables["params"], variables.get("batch_stats", {}), meta={"img_size": 64})
    payload, bs, meta = load_checkpoint(path)
    assert meta["img_size"] == 64
    orig = jax.tree.leaves(variables["params"])
    back = jax.tree.leaves(payload["params"])
    assert len(orig) == len(back)
    np.testing.assert_array_equal(np.asarray(orig[0]), np.asarray(back[0]))


def test_fusion_landmarks():
    F, CX, CY, B = 381.0, 320.0, 240.0, 26.0

    def project(p3d, shift=0.0):
        p = np.asarray(p3d, float)
        return np.stack([(p[:, 0] - shift) * F / p[:, 2] + CX, p[:, 1] * F / p[:, 2] + CY], axis=1)

    # pallet 1 m ahead of the camera, robot at (1000, 500) facing +y
    pts = np.array([[-55.0, -20, 1000], [55, -20, 1000], [55, 80, 1000], [-55, 80, 1000]])
    pose = (1000.0, 500.0, np.pi / 2)
    lm = project_detection(pose, project(pts), project(pts, B))
    # camera Z=1000 forward => robot x+1000 => world y+1000 (theta=90deg)
    assert abs(lm.xy_mm[0] - 1000.0) < 30
    assert abs(lm.xy_mm[1] - 1500.0) < 30

    m = LandmarkMap(merge_radius_mm=300)
    i1 = m.insert(lm)
    i2 = m.insert(lm)  # same spot -> merges
    assert i1 == i2 and m.landmarks[0].n_obs == 2
    markers = m.to_pixel_markers(MapConfig())
    assert markers[0]["n_obs"] == 2
