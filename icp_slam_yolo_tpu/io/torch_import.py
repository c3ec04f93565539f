"""Torch -> Flax weight importer for Ultralytics-layout YOLO checkpoints.

The reference fine-tunes from COCO-pretrained `yolo12n.pt`
(`/root/reference/train2/args.yaml:3,18` ``model: yolo12n.pt``,
``pretrained: true``).  This shim maps an Ultralytics-layout torch state dict
onto `models/yolo.py`'s module tree so a ``.pt``-derived parameter set can be
used for fine-tuning or inference here.

Weight compatibility holds for the ``family="v8"`` graph: the backbone
(Conv/C2f/SPPF ladder), PAN-FPN neck and decoupled DFL head follow the
upstream yolov8 wiring block-for-block, including concat order and the
channel-split order inside C2f (torch ``chunk(2, dim=1)`` == NHWC
``[..., :c] / [..., c:]``).  The v11/v12 graphs are capability ports (block
counts match the public yamls but not parameter-for-parameter), so importing
those is refused rather than silently mis-mapped.

Layout transforms:
  * conv weights: torch OIHW -> flax HWIO (transpose 2,3,1,0)
  * BatchNorm: weight/bias -> scale/bias (params), running_mean/var ->
    mean/var (batch_stats)
  * the head's DFL conv is a frozen ``arange`` projection in Ultralytics;
    `dfl_decode` computes it in-graph, so ``*.dfl.*`` keys are skipped.

Ultralytics module index -> this tree (yolov8 yaml order):
  0 stem, 1 down2, 2 c2f_2, 3 down3, 4 c2f_3, 5 down4, 6 c2f_4, 7 down5,
  8 c2f_5, 9 sppf, [10 Upsample, 11 Concat], 12 neck_p4, [13, 14],
  15 neck_p3, 16 pan_d3, [17], 18 pan_p4, 19 pan_d4, [20], 21 pan_p5,
  22 head (cv2 = box branch, cv3 = cls branch, dfl skipped).
"""

from __future__ import annotations

import numpy as np

_BACKBONE_IDX = {
    "0": "stem", "1": "down2", "2": "c2f_2", "3": "down3", "4": "c2f_3",
    "5": "down4", "6": "c2f_4", "7": "down5", "8": "c2f_5", "9": "sppf",
    "12": "neck_p4", "15": "neck_p3", "16": "pan_d3", "18": "pan_p4",
    "19": "pan_d4", "21": "pan_p5", "22": "head",
}


def _np(v) -> np.ndarray:
    """Accept torch tensors or arrays without importing torch."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _convbn(params, stats, flax_path: list[str], torch_prefix: str, sd: dict) -> None:
    """One ConvBnAct unit: ``<torch_prefix>.conv`` + ``<torch_prefix>.bn``."""
    w = _np(sd.pop(torch_prefix + ".conv.weight"))
    _set(params, flax_path + ["Conv_0", "kernel"], w.transpose(2, 3, 1, 0))
    _set(params, flax_path + ["BatchNorm_0", "scale"], _np(sd.pop(torch_prefix + ".bn.weight")))
    _set(params, flax_path + ["BatchNorm_0", "bias"], _np(sd.pop(torch_prefix + ".bn.bias")))
    _set(stats, flax_path + ["BatchNorm_0", "mean"], _np(sd.pop(torch_prefix + ".bn.running_mean")))
    _set(stats, flax_path + ["BatchNorm_0", "var"], _np(sd.pop(torch_prefix + ".bn.running_var")))
    sd.pop(torch_prefix + ".bn.num_batches_tracked", None)


def _plain_conv(params, flax_path: list[str], torch_prefix: str, sd: dict) -> None:
    w = _np(sd.pop(torch_prefix + ".weight"))
    _set(params, flax_path + ["kernel"], w.transpose(2, 3, 1, 0))
    b = sd.pop(torch_prefix + ".bias", None)
    if b is not None:
        _set(params, flax_path + ["bias"], _np(b))


def _c2f(params, stats, name: str, tp: str, sd: dict) -> None:
    """C2f: cv1 -> ConvBnAct_0, m.{i} -> Bottleneck_{i}, cv2 -> ConvBnAct_1."""
    _convbn(params, stats, [name, "ConvBnAct_0"], tp + ".cv1", sd)
    i = 0
    while tp + f".m.{i}.cv1.conv.weight" in sd:
        _convbn(params, stats, [name, f"Bottleneck_{i}", "ConvBnAct_0"], tp + f".m.{i}.cv1", sd)
        _convbn(params, stats, [name, f"Bottleneck_{i}", "ConvBnAct_1"], tp + f".m.{i}.cv2", sd)
        i += 1
    _convbn(params, stats, [name, "ConvBnAct_1"], tp + ".cv2", sd)


def _detect_head(params, stats, tp: str, sd: dict, n_levels: int = 3) -> None:
    """Decoupled head: cv2 (box) / cv3 (cls) Sequentials per pyramid level.
    Flax compact numbering per level i: box ConvBnAct_{4i},{4i+1} + Conv_{2i};
    cls ConvBnAct_{4i+2},{4i+3} + Conv_{2i+1}."""
    for i in range(n_levels):
        _convbn(params, stats, ["head", f"ConvBnAct_{4 * i}"], f"{tp}.cv2.{i}.0", sd)
        _convbn(params, stats, ["head", f"ConvBnAct_{4 * i + 1}"], f"{tp}.cv2.{i}.1", sd)
        _plain_conv(params, ["head", f"Conv_{2 * i}"], f"{tp}.cv2.{i}.2", sd)
        _convbn(params, stats, ["head", f"ConvBnAct_{4 * i + 2}"], f"{tp}.cv3.{i}.0", sd)
        _convbn(params, stats, ["head", f"ConvBnAct_{4 * i + 3}"], f"{tp}.cv3.{i}.1", sd)
        _plain_conv(params, ["head", f"Conv_{2 * i + 1}"], f"{tp}.cv3.{i}.2", sd)
    # DFL projection is a frozen arange; computed in-graph by dfl_decode
    for k in [k for k in sd if k.startswith(f"{tp}.dfl.")]:
        sd.pop(k)


def convert_state_dict(state_dict: dict, family: str = "v8") -> tuple[dict, dict]:
    """Ultralytics flat state dict -> ``(params, batch_stats)`` pytrees for
    ``YOLO(family="v8", task="detect")``.

    ``state_dict`` values may be torch tensors or numpy arrays; keys may carry
    the DetectionModel's ``model.`` prefix or not.  Raises ``ValueError`` on
    non-v8 families (not weight-compatible) and on leftover unmapped keys
    (a silent partial import would be worse than a loud failure).
    """
    if family != "v8":
        raise ValueError(
            f"family {family!r} is a capability port, not weight-compatible "
            "with Ultralytics layouts; only family='v8' can import .pt weights"
        )
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("model."):] if k.startswith("model.") else k] = v

    params: dict = {}
    stats: dict = {}
    for idx, name in _BACKBONE_IDX.items():
        tp = idx
        if name == "head":
            _detect_head(params, stats, tp, sd)
        elif any(k.startswith(tp + ".cv1.") for k in sd):
            if any(k.startswith(tp + ".m.") for k in sd):
                _c2f(params, stats, name, tp, sd)
            else:  # SPPF: cv1/cv2 only
                _convbn(params, stats, [name, "ConvBnAct_0"], tp + ".cv1", sd)
                _convbn(params, stats, [name, "ConvBnAct_1"], tp + ".cv2", sd)
        else:  # bare ConvBnAct (stem / downsamples)
            _convbn(params, stats, [name], tp, sd)
    if sd:
        raise ValueError(f"unmapped torch keys after import: {sorted(sd)[:8]} "
                         f"(+{max(0, len(sd) - 8)} more)")
    return params, stats


def validate_against_model(params: dict, batch_stats: dict, model, img_size: int = 64) -> None:
    """Shape-check an imported tree against a fresh init of ``model`` — every
    leaf must exist with the same shape (catches variant/num_classes
    mismatches before a cryptic apply-time error)."""
    import jax
    import jax.numpy as jnp

    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3)))
    )

    def walk(ref, got, path):
        if hasattr(ref, "shape"):
            if not hasattr(got, "shape") or tuple(got.shape) != tuple(ref.shape):
                raise ValueError(f"shape mismatch at {path}: expected {ref.shape}, "
                                 f"got {getattr(got, 'shape', type(got))}")
            return
        missing = set(ref) - set(got)
        extra = set(got) - set(ref)
        if missing or extra:
            raise ValueError(f"tree mismatch at {path}: missing {sorted(missing)}, "
                             f"unexpected {sorted(extra)}")
        for k in ref:
            walk(ref[k], got[k], f"{path}/{k}")

    walk(init["params"], params, "params")
    walk(init["batch_stats"], batch_stats, "batch_stats")


def load_ultralytics_pt(path: str, num_classes: int = 1, variant: str = "n"):
    """Load a ``.pt`` Ultralytics checkpoint into a ready `Detector`-shaped
    ``(params, batch_stats)`` pair (requires torch; the torch dependency is
    confined to this loader — `convert_state_dict` itself is torch-free)."""
    import torch

    from icp_slam_yolo_tpu.models.yolo import YOLO

    blob = torch.load(path, map_location="cpu", weights_only=False)
    model_obj = blob.get("model", blob) if isinstance(blob, dict) else blob
    sd = model_obj.state_dict() if hasattr(model_obj, "state_dict") else model_obj
    params, stats = convert_state_dict(sd)
    validate_against_model(
        params, stats, YOLO(num_classes=num_classes, variant=variant, family="v8")
    )
    return params, stats
