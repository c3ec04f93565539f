"""Torch -> Flax import shim: synthetic Ultralytics-layout round trip.

No real ``.pt`` exists in the mirror (binary blobs stripped), so the test
constructs a torch-LAYOUT state dict from a real flax init via an independent
inverse mapping, imports it, and requires numerically identical forwards —
which exercises the name map, the OIHW->HWIO transposes and the BN
params/stats split end to end (BASELINE.md: the shim is the one missing piece
for `train2/args.yaml:18` ``pretrained: true`` fine-tuning)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icp_slam_yolo_tpu.io.torch_import import (
    convert_state_dict,
    validate_against_model,
)
from icp_slam_yolo_tpu.models.yolo import YOLO

IDX = {
    "stem": "0", "down2": "1", "c2f_2": "2", "down3": "3", "c2f_3": "4",
    "down4": "5", "c2f_4": "6", "down5": "7", "c2f_5": "8", "sppf": "9",
    "neck_p4": "12", "neck_p3": "15", "pan_d3": "16", "pan_p4": "18",
    "pan_d4": "19", "pan_p5": "21", "head": "22",
}


def _inv_convbn(sd, tp, p, s):
    sd[tp + ".conv.weight"] = np.asarray(p["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
    sd[tp + ".bn.weight"] = np.asarray(p["BatchNorm_0"]["scale"])
    sd[tp + ".bn.bias"] = np.asarray(p["BatchNorm_0"]["bias"])
    sd[tp + ".bn.running_mean"] = np.asarray(s["BatchNorm_0"]["mean"])
    sd[tp + ".bn.running_var"] = np.asarray(s["BatchNorm_0"]["var"])
    sd[tp + ".bn.num_batches_tracked"] = np.int64(0)  # must be ignored


def _inv_plain(sd, tp, p):
    sd[tp + ".weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[tp + ".bias"] = np.asarray(p["bias"])


def flax_to_torch_layout(params, stats) -> dict:
    """Independent inverse of convert_state_dict's documented mapping."""
    sd = {}
    for name, idx in IDX.items():
        p, s = params[name], stats.get(name, {})
        if name == "head":
            for i in range(3):
                _inv_convbn(sd, f"22.cv2.{i}.0", p[f"ConvBnAct_{4 * i}"], s[f"ConvBnAct_{4 * i}"])
                _inv_convbn(sd, f"22.cv2.{i}.1", p[f"ConvBnAct_{4 * i + 1}"], s[f"ConvBnAct_{4 * i + 1}"])
                _inv_plain(sd, f"22.cv2.{i}.2", p[f"Conv_{2 * i}"])
                _inv_convbn(sd, f"22.cv3.{i}.0", p[f"ConvBnAct_{4 * i + 2}"], s[f"ConvBnAct_{4 * i + 2}"])
                _inv_convbn(sd, f"22.cv3.{i}.1", p[f"ConvBnAct_{4 * i + 3}"], s[f"ConvBnAct_{4 * i + 3}"])
                _inv_plain(sd, f"22.cv3.{i}.2", p[f"Conv_{2 * i + 1}"])
            # Ultralytics ships a frozen arange DFL conv; importer must skip it
            sd["22.dfl.conv.weight"] = np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1)
        elif "Bottleneck_0" in p:  # C2f
            _inv_convbn(sd, idx + ".cv1", p["ConvBnAct_0"], s["ConvBnAct_0"])
            i = 0
            while f"Bottleneck_{i}" in p:
                b, bs = p[f"Bottleneck_{i}"], s[f"Bottleneck_{i}"]
                _inv_convbn(sd, f"{idx}.m.{i}.cv1", b["ConvBnAct_0"], bs["ConvBnAct_0"])
                _inv_convbn(sd, f"{idx}.m.{i}.cv2", b["ConvBnAct_1"], bs["ConvBnAct_1"])
                i += 1
            _inv_convbn(sd, idx + ".cv2", p["ConvBnAct_1"], s["ConvBnAct_1"])
        elif "ConvBnAct_0" in p:  # SPPF
            _inv_convbn(sd, idx + ".cv1", p["ConvBnAct_0"], s["ConvBnAct_0"])
            _inv_convbn(sd, idx + ".cv2", p["ConvBnAct_1"], s["ConvBnAct_1"])
        else:  # bare ConvBnAct
            _inv_convbn(sd, idx, p, s)
    return sd


@pytest.fixture(scope="module")
def v8n():
    model = YOLO(num_classes=1, variant="n", family="v8")
    rng = jax.random.PRNGKey(7)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_round_trip_identical_forward(v8n):
    model, variables = v8n
    # randomize batch_stats so the stats split is actually exercised
    stats = jax.tree.map(
        lambda a: np.abs(np.random.default_rng(3).normal(size=a.shape)).astype(np.float32),
        jax.device_get(variables["batch_stats"]),
    )
    sd = flax_to_torch_layout(jax.device_get(variables["params"]), stats)
    # the DetectionModel prefix must be accepted too
    sd = {"model." + k: v for k, v in sd.items()}
    params, new_stats = convert_state_dict(sd)
    validate_against_model(params, new_stats, model)

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    ref = model.apply(variables, x)
    out = model.apply({"params": variables["params"], "batch_stats": stats}, x)
    imp = model.apply({"params": params, "batch_stats": new_stats}, x)
    for (rb, rc), (ib, ic) in zip(out, imp):
        np.testing.assert_array_equal(np.asarray(rb), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(rc), np.asarray(ic))
    # sanity: the randomized stats actually changed the output vs the init
    assert not np.allclose(np.asarray(ref[0][0]), np.asarray(out[0][0]))


def test_torch_tensor_values_and_leftover_keys(v8n):
    model, variables = v8n
    sd = flax_to_torch_layout(
        jax.device_get(variables["params"]), jax.device_get(variables["batch_stats"])
    )
    torch = pytest.importorskip("torch")
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) if isinstance(v, np.ndarray) else v
            for k, v in sd.items()}
    params, stats = convert_state_dict(sd_t)
    validate_against_model(params, stats, model)

    sd_t["model.99.mystery.weight"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unmapped"):
        convert_state_dict(sd_t)


def test_non_v8_family_refused():
    with pytest.raises(ValueError, match="capability port"):
        convert_state_dict({}, family="v12")


def test_shape_mismatch_detected(v8n):
    model, variables = v8n
    sd = flax_to_torch_layout(
        jax.device_get(variables["params"]), jax.device_get(variables["batch_stats"])
    )
    sd["0.conv.weight"] = np.zeros((32, 3, 3, 3), np.float32)  # wrong width
    params, stats = convert_state_dict(sd)
    with pytest.raises(ValueError, match="shape mismatch"):
        validate_against_model(params, stats, model)


def test_pt_file_to_detector(v8n, tmp_path):
    """A torch-saved .pt state dict loads straight into a working Detector
    (detector_from_checkpoint's .pt branch)."""
    torch = pytest.importorskip("torch")
    model, variables = v8n
    sd = flax_to_torch_layout(
        jax.device_get(variables["params"]), jax.device_get(variables["batch_stats"])
    )
    pt = tmp_path / "synthetic_yolov8n.pt"
    torch.save({"model": {("model." + k): torch.as_tensor(np.array(v)) for k, v in sd.items()}}, pt)

    from icp_slam_yolo_tpu.models.detect import detector_from_checkpoint

    det = detector_from_checkpoint(str(pt), img_size=64, compute_dtype=jnp.float32)
    out = det(np.zeros((48, 64, 3), np.uint8))
    assert out["boxes"].shape[1] == 4 and "scores" in out
