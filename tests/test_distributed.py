"""Multi-host helpers (`parallel/distributed.py`): per-process batch math,
single-host no-op initialise, and a real 2-process `jax.distributed` CPU
smoke test via subprocess (multi-host is exactly the code that can't be
hand-checked later)."""

import os
import subprocess
import sys
import textwrap

import pytest

from icp_slam_yolo_tpu.parallel import distributed


def test_process_local_batch_size_single_host():
    # under the test conftest we are one process
    assert distributed.process_local_batch_size(16) == 16
    assert distributed.process_local_batch_size(1) == 1


def test_process_local_batch_size_indivisible(monkeypatch):
    monkeypatch.setattr(distributed.jax, "process_count", lambda: 4)
    assert distributed.process_local_batch_size(16) == 4
    with pytest.raises(ValueError):
        distributed.process_local_batch_size(10)


def test_initialize_noop_without_coordinator(monkeypatch):
    """No JAX_COORDINATOR_ADDRESS -> single-host no-op (jax stays usable)."""
    import jax

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    distributed.initialize()
    assert jax.process_count() == 1
    assert len(jax.devices()) >= 1


def test_global_fleet_mesh_covers_all_devices():
    import jax

    mesh = distributed.global_fleet_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == len(jax.devices())


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from icp_slam_yolo_tpu.parallel import distributed
    distributed.initialize(
        coordinator={coord!r}, num_processes=2, process_id=int(sys.argv[1])
    )
    import jax.numpy as jnp
    assert jax.process_count() == 2, jax.process_count()
    assert distributed.process_local_batch_size(8) == 4
    # one cross-process collective so the test proves real comm, not just init
    from jax.experimental import multihost_utils
    total = multihost_utils.process_allgather(jnp.asarray([jax.process_index()]))
    assert sorted(total.ravel().tolist()) == [0, 1], total
    print("WORKER_OK", jax.process_index())
    """
)


_SHARED_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from icp_slam_yolo_tpu.parallel import distributed
    distributed.initialize(
        coordinator={coord!r}, num_processes=2, process_id=int(sys.argv[1])
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    from icp_slam_yolo_tpu.config import IcpConfig, MapConfig, OccupancyConfig, SlamConfig
    from icp_slam_yolo_tpu.parallel.shared import shared_fleet_run

    cfg = SlamConfig(
        map=MapConfig(width_mm=6000.0, height_mm=6000.0, resolution_mm_per_px=30.0),
        icp=IcpConfig(max_iterations=8),
        occupancy=OccupancyConfig(window_px=60, max_ray_px=80),
        n_max=128, map_capacity=512,
    )

    def synth(seed):
        rng = np.random.default_rng(seed)
        out = np.zeros((128, 3), np.float32)
        ang = np.concatenate([rng.uniform(0, 135, 48), rng.uniform(225, 360, 48)])
        out[:96, 0] = 40.0
        out[:96, 1] = ang
        out[:96, 2] = 2000.0 + 500.0 * np.sin(np.deg2rad(ang) * 3) + rng.normal(0, 10, 96)
        return out

    pid = jax.process_index()
    mesh = Mesh(np.asarray(jax.devices()), ("data",))  # 2 devices, one per process
    local = np.stack([synth(pid), synth(100 + pid), synth(200 + pid)])[None]  # (1, 3, 128, 3)
    scans = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))

    map_xy, map_valid, occ, poses, outs = shared_fleet_run(scans, cfg, mesh=mesh)
    jax.block_until_ready(occ)
    # the shared map is replicated: every process sees the SAME merged state
    n_live = int(np.asarray(occ.addressable_shards[0].data < 0.5).sum())
    assert occ.shape == (cfg.map.height_px, cfg.map.width_px)
    assert outs.accepted.shape == (2, 2)
    print("SHARED_WORKER_OK", pid, "free_cells", n_live)
    """
)


@pytest.mark.slow
def test_two_process_shared_map(tmp_path):
    """The collaborative shared-map fleet across 2 REAL processes: psum +
    all_gather ride the distributed backend (DCN analog), map replicated."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = "127.0.0.1:18764"
    script = tmp_path / "shared_worker.py"
    script.write_text(_SHARED_WORKER.format(repo=repo, coord=coord))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("shared-map distributed test timed out\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip("jax.distributed unavailable in this environment")
        assert p.returncode == 0, out
        assert "SHARED_WORKER_OK" in out


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    """Real jax.distributed.initialize across 2 CPU processes + allgather."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = "127.0.0.1:18763"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, coord=coord))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # virtual-device flag confuses process mapping
    # the axon sitecustomize pre-imports jax AND initialises its backend,
    # which jax.distributed.initialize forbids — run the workers without it
    env["PYTHONPATH"] = repo
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed smoke test timed out\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip("jax.distributed unavailable in this environment")
        assert p.returncode == 0, out
        assert "WORKER_OK" in out
