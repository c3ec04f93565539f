"""Model checkpointing: msgpack (flax serialization) with a JSON sidecar.

The reference's "checkpoints" are Ultralytics ``.pt`` files (stripped from the
mirror) plus map PNG/npy/PCD artifacts (`mainn.py:34-69`).  Model weights here
are a single msgpack file + ``<path>.json`` metadata (img size, classes,
variant, task) so a Detector can be reconstructed from disk.
"""

from __future__ import annotations

import json
import os

from flax import serialization


def save_checkpoint(path: str, params, batch_stats=None, meta: dict | None = None) -> None:
    payload = {"params": params, "batch_stats": batch_stats or {}}
    data = serialization.to_bytes(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    with open(path + ".json", "w") as f:
        json.dump(meta or {}, f, indent=2)


def load_checkpoint(path: str):
    """Returns ``(variables_dict, batch_stats, meta)``; variables_dict has
    'params' and 'batch_stats' keys suitable for `models.detect.Detector`."""
    with open(path, "rb") as f:
        data = f.read()
    payload = serialization.msgpack_restore(data)
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return payload, payload.get("batch_stats", {}), meta
