"""YOLO training loop: optax SGD, batch-sharded train step, checkpointing.

Mirrors the reference's Ultralytics training setup (`train2/args.yaml`:
SGD lr0=0.01 momentum=0.937 weight_decay=0.0005, warmup 3 epochs, batch 16,
640 px, single class) as a jitted JAX step.  Data parallelism shards the batch
axis over the mesh (`parallel/mesh.py`); gradients all-reduce over ICI via the
sharding annotations — no explicit collectives needed.  TP/PP/SP/EP are N/A
for a 3M-parameter detector (SURVEY.md section 2.6).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from icp_slam_yolo_tpu.models.losses import LossWeights, detection_loss
from icp_slam_yolo_tpu.models.yolo import YOLO


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    lr: float = 0.01,
    momentum: float = 0.937,
    weight_decay: float = 0.0005,
    warmup_steps: int = 100,
    total_steps: int = 10000,
    clip_norm: float = 10.0,
):
    """SGD + nesterov with linear warmup and cosine decay (`train2/args.yaml`:
    lr0=0.01, lrf=0.01, momentum=0.937, warmup_epochs=3).  Gradients are
    global-norm clipped, and — like Ultralytics' parameter groups — weight
    decay skips biases and BatchNorm scales (decaying BN scale destabilises
    training; an unclipped run went NaN around step 400)."""
    warmup_steps = min(warmup_steps, max(total_steps // 10, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=lr * 0.1, peak_value=lr, warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1), end_value=lr * 0.01,
    )

    def decay_mask(params):
        def rule(path, _):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return name not in ("bias", "scale")

        return jax.tree_util.tree_map_with_path(rule, params)

    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.masked(optax.add_decayed_weights(weight_decay), decay_mask),
        optax.sgd(schedule, momentum=momentum, nesterov=True),
    )


def create_train_state(
    model: YOLO, img_size: int, seed: int = 0, tx=None, total_steps: int = 10000
) -> tuple[TrainState, optax.GradientTransformation]:
    dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = model.init(jax.random.key(seed), dummy, train=False)
    tx = tx or make_optimizer(total_steps=total_steps)
    params = variables["params"]
    return TrainState(params, variables.get("batch_stats", {}), tx.init(params), jnp.int32(0)), tx


def make_train_step(model: YOLO, tx, img_size: int, weights: LossWeights = LossWeights()):
    """Returns jittable ``step(state, batch) -> (state, metrics)``.

    ``batch``: dict with ``images (B, S, S, 3)``, ``boxes (B, M, 4)`` xyxy px,
    ``classes (B, M)``, ``valid (B, M)``.
    """

    def loss_fn(params, batch_stats, batch):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"],
            train=True,
            mutable=["batch_stats"],
        )
        if model.task == "segment":
            from icp_slam_yolo_tpu.models.losses import segmentation_loss

            outs, protos = out
            total, metrics = segmentation_loss(
                outs, protos, batch["boxes"], batch["classes"], batch["valid"],
                batch["masks"], img_size, model.num_classes, model.reg_max, weights,
            )
        elif model.task == "pose":
            from icp_slam_yolo_tpu.models.losses import pose_loss

            total, metrics = pose_loss(
                out, batch["boxes"], batch["classes"], batch["valid"],
                batch["kpts"], img_size, model.num_classes, model.reg_max, weights,
            )
        else:
            total, metrics = detection_loss(
                out, batch["boxes"], batch["classes"], batch["valid"],
                img_size, model.num_classes, model.reg_max, weights,
                gt_angles=batch.get("angles"),
            )
        return total, (metrics, mutated["batch_stats"])

    def step(state: TrainState, batch):
        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm)
        return TrainState(params, new_bs, opt_state, state.step + 1), metrics

    return step


def fit(
    model: YOLO,
    dataset_iter,
    img_size: int,
    steps: int,
    state: TrainState | None = None,
    tx=None,
    log_every: int = 50,
    mesh=None,
):
    """Minimal host training loop over an iterator of batches."""
    if state is None:
        state, tx = create_train_state(model, img_size, total_steps=steps)
    step_fn = jax.jit(make_train_step(model, tx, img_size))
    history = []
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in next(dataset_iter).items()}
        state, metrics = step_fn(state, batch)
        if (i + 1) % log_every == 0 or i == 0:
            m = {"step": i + 1, **{k: float(v) for k, v in metrics.items()}}
            history.append(m)
            print(f"step {i + 1}/{steps}: " + " ".join(
                f"{k}={v:.4f}" for k, v in m.items() if k != "step"))
    return state, history


def write_results_csv(history: list[dict], path: str) -> None:
    """Training-curve CSV (the reference ships Ultralytics `results.csv`
    per run, `train2/results.csv`): one row per logged step, columns unioned
    across the history."""
    import csv

    cols = sorted({k for row in history for k in row}, key=lambda k: (k != "step", k))
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerows(history)


# --- multi-chip dry run (called from __graft_entry__.dryrun_multichip) -------

def dryrun_train_step(n_devices: int, img_size: int = 64, batch: int | None = None) -> None:
    """Jit the FULL training step over an ``n_devices`` data-parallel mesh and
    run one step on tiny shapes: params replicated, batch sharded, gradient
    all-reduce inserted by XLA from the shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from icp_slam_yolo_tpu.parallel.mesh import make_mesh

    b = batch or n_devices
    mesh = make_mesh(n_devices)
    data_shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    model = YOLO(num_classes=1)
    state, tx = create_train_state(model, img_size, total_steps=10)
    state = jax.device_put(state, repl)

    rng = np.random.default_rng(0)
    m = 4
    batch_data = {
        "images": jax.device_put(jnp.asarray(rng.uniform(0, 1, (b, img_size, img_size, 3)), jnp.float32), data_shard),
        "boxes": jax.device_put(jnp.asarray(np.tile([[8.0, 8, 40, 40]], (b, m, 1)), jnp.float32), data_shard),
        "classes": jax.device_put(jnp.zeros((b, m), jnp.int32), data_shard),
        "valid": jax.device_put(jnp.asarray(np.tile([True] + [False] * (m - 1), (b, 1))), data_shard),
    }
    step_fn = jax.jit(make_train_step(model, tx, img_size), out_shardings=(repl, None))
    state, metrics = step_fn(state, batch_data)
    jax.block_until_ready(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
