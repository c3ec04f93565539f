"""CLI smoke tests (fast subcommands only; replay/serve covered elsewhere)."""

import os

import pytest
from PIL import Image

from icp_slam_yolo_tpu.cli import main


def test_label_check_cli(tmp_path, capsys):
    (tmp_path / "ok.txt").write_text("0 0.5 0.5 0.1 0.1\n")
    main(["label-check", str(tmp_path)])
    out = capsys.readouterr().out
    assert "checked 1 files: 0" in out


def test_label_check_cli_bad_exit(tmp_path):
    (tmp_path / "bad.txt").write_text("0 2.0 0.5 0.1 0.1\n")
    with pytest.raises(SystemExit) as e:
        main(["label-check", str(tmp_path)])
    assert e.value.code == 1
    main(["label-check", str(tmp_path), "--fix"])  # exits 0 after repair


def test_split_cli(tmp_path, capsys):
    src = tmp_path / "src"
    (src / "images").mkdir(parents=True)
    (src / "labels").mkdir()
    for i in range(5):
        Image.new("RGB", (4, 4)).save(src / "images" / f"i{i}.jpg")
        (src / "labels" / f"i{i}.txt").write_text("0 0.5 0.5 0.1 0.1\n")
    main(["split", str(src), str(tmp_path / "out"), "--ratio", "0.6"])
    out = capsys.readouterr().out
    assert "3 train / 2 val" in out
    assert len(os.listdir(tmp_path / "out" / "train" / "images")) == 3


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_train_segment_cli(tmp_path, capsys):
    """`cli train --task segment` end-to-end on a tiny polygon dataset."""
    src = tmp_path / "ds"
    (src / "images").mkdir(parents=True)
    (src / "labels").mkdir()
    for i in range(2):
        Image.new("RGB", (64, 64), (i * 40, 80, 120)).save(src / "images" / f"i{i}.jpg")
        (src / "labels" / f"i{i}.txt").write_text(
            "0 0.2 0.2 0.8 0.2 0.8 0.8 0.2 0.8\n"
        )
    ckpt = str(tmp_path / "seg.msgpack")
    main(["train", str(src), "--task", "segment", "--img-size", "64",
          "--batch-size", "2", "--steps", "2", "--max-gt", "4", "--output", ckpt])
    assert os.path.exists(ckpt)
    import json as _json

    meta = _json.load(open(ckpt + ".json"))
    assert meta["task"] == "segment"


def test_eval_cli_detect(tmp_path, capsys):
    """`cli eval` on the shipped detect checkpoint over real val images
    (Ultralytics `val` surface parity: the reference's results.csv metrics)."""
    data = "/root/reference/dataset_pallet/val"
    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                        "pallet_detect_640.msgpack")
    if not os.path.isdir(data) or not os.path.exists(ckpt):
        pytest.skip("reference dataset / shipped checkpoint unavailable")
    out_json = str(tmp_path / "metrics.json")
    main(["eval", "--weights", ckpt, "--data", data, "--max-images", "2",
          "--output", out_json])
    import json

    metrics = json.loads(open(out_json).read())
    assert metrics["task"] == "detect"
    assert set(metrics) >= {"precision", "recall", "mAP50", "mAP50_95"}
    # structural bound only: 2 images is too small a sample to gate quality on
    # (the full-val quality bar lives in checkpoints/*.metrics.json + cli eval)
    assert 0.0 <= metrics["mAP50"] <= 1.0
