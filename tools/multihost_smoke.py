"""Multi-host (multi-process) DP smoke — SURVEY.md §5.8 / VERDICT r1 §2.16.

Forms a real 2-process jax.distributed cluster on localhost (CPU backend,
2 virtual devices per process → a 4-device global mesh), runs ONE
shard_map'd DP train step with gradient pmean + cross-replica BN spanning
the process boundary, and checks the replicated state agrees bitwise
across processes (printed digest).

This is the same code path a TPU pod runs (jax.distributed.initialize →
mesh over jax.devices() → make_parallel_train_step); only the transport
differs (gRPC/TCP here, ICI/DCN there).

Usage:
  python tools/multihost_smoke.py            # launcher: spawns 2 workers
  python tools/multihost_smoke.py worker <i> # internal
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = 12357


def worker(pid: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=2, process_id=pid)
    import hashlib

    import jax.numpy as jnp
    import numpy as np

    from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
    from dvdgan_tpu import parallel
    from dvdgan_tpu.train import TrainConfig, create

    assert jax.process_count() == 2, jax.process_count()
    n = jax.device_count()          # 4 global (2 local per process)
    assert n == 4, n

    g_cfg = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                    emb_dim=16, attn_res=16)
    ds_cfg = DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2)
    dt_cfg = DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5)
    tc = TrainConfig(d_steps=1, batch_size=n)

    mesh = parallel.make_mesh()     # spans both processes' devices
    state = parallel.replicate_state(
        mesh, create(jax.random.PRNGKey(0), g_cfg, ds_cfg, dt_cfg, tc))

    # every process materializes the same global batch; device_put with the
    # batch sharding keeps only this process's shards locally
    rng = np.random.RandomState(0)
    real = rng.randn(n, 4, 32, 32, 3).astype(np.float32)
    y = (np.arange(n) % 5).astype(np.int32)
    real_d, y_d = parallel.shard_batch(mesh, real, y)

    step = parallel.make_parallel_train_step(g_cfg, ds_cfg, dt_cfg, tc, mesh)
    state, metrics = step(state, real_d, y_d, jax.random.PRNGKey(1))

    m = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in m.values()), m
    assert int(state["step"]) == 1
    # digest of the (replicated) updated params — must match across procs
    leaves = jax.tree.leaves(jax.device_get(state["g"]["params"]))
    digest = hashlib.sha256(
        b"".join(np.ascontiguousarray(l).tobytes() for l in leaves)
    ).hexdigest()[:16]
    print(f"proc {pid}: metrics {m} params-digest {digest}", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2").strip()
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    rcs = [p.returncode for p in procs]
    digests = []
    for i, out in enumerate(outs):
        print(f"--- worker {i} (rc={rcs[i]}) ---")
        print(out[-1500:])
        for line in out.splitlines():
            if "params-digest" in line:
                digests.append(line.split()[-1])
    ok = rcs == [0, 0] and len(digests) == 2 and digests[0] == digests[1]
    print("MULTIHOST-SMOKE-" + ("OK" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
