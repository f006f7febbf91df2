"""Multi-host (multi-process) DP + CP smoke — SURVEY.md §5.8 / r1 §2.16.

Forms a real 2-process jax.distributed cluster on localhost (CPU backend,
2 virtual devices per process → a 4-device global mesh), then runs SIX
train legs and checks the replicated state agrees
bitwise across processes (printed digests):

  1. DP: 1-D data mesh — gradient pmean + cross-replica BN span the
     process boundary.
  1b. DP with per-process input sharding: each process materializes only
     its own batch rows (local_batch_rows + shard_batch_local — the
     pod-scale input pipeline); must reproduce leg 1 bitwise.
  1c. DP chunked stepping: K=2 scanned steps per dispatch with
     per-process (K, local_rows, …) chunk assembly — the pod deployment
     shape of --steps_per_call.
  1d. Full Trainer end-to-end, twice: train 2 steps (per-process Loader
     rows, leader-only scalar/sample writes, Orbax multi-process
     checkpoint save, replicated sample jit), then a second Trainer
     resumes from the shared out_dir (leader-broadcast step) and
     continues — params AND sampled-clip digests must match.
  2. CP: 2-D (time=2 outer, data=2) mesh — `time` is the OUTER axis, so
     for a fixed data rank the two time shards live on DIFFERENT
     processes: DT's ppermute frame-halo exchange and the time-axis
     score psum cross the process boundary (the pod-scale long-clip
     topology, SURVEY §5.7).
  3. FP: DVD-GAN-FP (cond_frames=2) on the same cross-process CP mesh —
     the frame-conditioned step's cond-concat full-res DT input and
     fp_enc gradients ride the cross-host halo/psum streams.

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
    from dvdgan_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()   # 4 train-step compiles/run on
    #                                         a 1-core host without it
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

    # Establish the cross-process gloo context NOW, while both workers are
    # in lockstep: a trivial all-device psum compiles in ~a second on both,
    # so they reach the rendezvous together. Without this, the first
    # worker to finish the multi-minute train-step compile (1 host core,
    # cold cache) sits in gloo context init >30 s waiting for the other
    # and the whole cluster tears down. (Belt: the launcher also raises
    # --xla_cpu_collective_timeout_seconds for the compile-skew window.)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    import numpy as np_
    wmesh = Mesh(np_.asarray(jax.devices()), ("d",))
    ones = jax.device_put(
        np_.ones((n,), np_.float32),
        NamedSharding(wmesh, PartitionSpec("d")))
    total = float(jax.jit(lambda x: x.sum())(ones))
    assert total == n, total

    g_cfg = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                    emb_dim=16, attn_res=16)
    ds_cfg = DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2)
    dt_cfg = DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5)
    tc = TrainConfig(d_steps=1, batch_size=n)

    def run_leg(tag: str, mesh, local_input: bool = False,
                gcfg=None) -> None:
        gcfg = gcfg or g_cfg
        clip_len = gcfg.n_frames + gcfg.cond_frames
        state = parallel.replicate_state(
            mesh, create(jax.random.PRNGKey(0), gcfg, ds_cfg, dt_cfg, tc))
        rng = np.random.RandomState(0)
        real = rng.randn(tc.batch_size, clip_len, 32, 32,
                         3).astype(np.float32)
        y = (np.arange(tc.batch_size) % 5).astype(np.int32)
        if local_input:
            # pod-scale input pipeline: this process materializes ONLY the
            # rows its devices own (Loader(rows=...) contract); the global
            # array is assembled from process-local shards. Must be
            # bitwise-identical to the full-global-batch leg.
            lo, hi = parallel.local_batch_rows(mesh, tc.batch_size)
            real_d, y_d = parallel.shard_batch_local(
                mesh, real[lo:hi], y[lo:hi], tc.batch_size)
        else:
            # every process materializes the same global batch; device_put
            # with the batch sharding keeps only this process's shards
            real_d, y_d = parallel.shard_batch(mesh, real, y)

        step = parallel.make_parallel_train_step(gcfg, ds_cfg, dt_cfg, tc,
                                                 mesh)
        state, metrics = step(state, real_d, y_d, jax.random.PRNGKey(1))

        m = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), m
        assert int(state["step"]) == 1
        # digest of the (replicated) updated params — must match across procs
        leaves = jax.tree.leaves(jax.device_get(state["g"]["params"]))
        digest = hashlib.sha256(
            b"".join(np.ascontiguousarray(l).tobytes() for l in leaves)
        ).hexdigest()[:16]
        print(f"proc {pid}: [{tag}] metrics {m} params-digest-{tag} {digest}",
              flush=True)

    run_leg("dp", parallel.make_mesh())
    # same program + data, but each process feeds only its own batch rows
    # (the multi-host input-sharding path): digest must equal dp's
    run_leg("dplocal", parallel.make_mesh(), local_input=True)

    # chunked stepping across processes: K=2 scanned steps per dispatch,
    # (K, local_rows, ...) chunks assembled per process — the pod-scale
    # deployment shape (--steps_per_call on a multi-host mesh)
    def run_chunk_leg() -> None:
        mesh = parallel.make_mesh()
        state = parallel.replicate_state(
            mesh, create(jax.random.PRNGKey(0), g_cfg, ds_cfg, dt_cfg, tc))
        rng = np.random.RandomState(0)
        reals = rng.randn(2, tc.batch_size, 4, 32, 32, 3).astype(np.float32)
        ys = np.stack([(np.arange(tc.batch_size) % 5).astype(np.int32)] * 2)
        lo, hi = parallel.local_batch_rows(mesh, tc.batch_size)
        r_d, y_d = parallel.shard_batch_chunk_local(
            mesh, reals[:, lo:hi], ys[:, lo:hi], tc.batch_size)
        step = parallel.make_parallel_train_step(
            g_cfg, ds_cfg, dt_cfg, tc, mesh, steps_per_call=2)
        state, metrics = step(state, r_d, y_d, jax.random.PRNGKey(1),
                              jnp.asarray(0, jnp.int32))
        m = {k: float(np.asarray(v)[-1]) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), m
        assert int(state["step"]) == 2
        leaves = jax.tree.leaves(jax.device_get(state["g"]["params"]))
        digest = hashlib.sha256(
            b"".join(np.ascontiguousarray(l).tobytes() for l in leaves)
        ).hexdigest()[:16]
        print(f"proc {pid}: [chunk] metrics {m} params-digest-chunk "
              f"{digest}", flush=True)

    run_chunk_leg()

    # full-Trainer leg: the ORCHESTRATION end-to-end across processes —
    # per-process input sharding auto-enabled (Loader rows), leader-only
    # scalar/sample writes, the Orbax multi-process checkpoint save
    # (every process calls it; Orbax elects the writer), and the global
    # sample jit (replicated z/y). Digests of the trained params AND the
    # sampled clips must match across processes.
    def run_trainer_leg() -> None:
        from dvdgan_tpu.train.trainer import Trainer
        from dvdgan_tpu.utils.config import Config

        out = "/tmp/dvdgan_mh_trainer"   # one dir: emulates pod shared FS
        # (cleaned by the LAUNCHER before spawning: a pid-0 rmtree here
        # races pid 1's auto-resume check into divergent programs)
        cfg = Config(dataset="synthetic", n_classes=5, img_size=32,
                     n_frames=4, ch=8, d_ch=8, k_frames=2, batch_size=4,
                     d_steps=1, total_step=2, log_step=1, sample_step=2,
                     model_save_step=2, emb_dim=16, attn_res=16,
                     bf16=False, out_dir=out)
        tr = Trainer(cfg)
        assert tr.is_main == (pid == 0)
        assert tr._local_rows is not None, "per-process rows expected"
        tr.train()
        vids = np.asarray(jax.device_get(tr.sample()), np.float32)
        leaves = jax.tree.leaves(jax.device_get(tr.state["g"]["params"]))
        tr.close()
        if pid == 0:   # leader wrote artifacts (shared dir: the non-
            #            leader can SEE them, so only the leader asserts)
            assert os.path.isdir(os.path.join(out, "checkpoints", "2"))
            assert os.path.getsize(
                os.path.join(out, "logs", "scalars.jsonl")) > 0
        digest = hashlib.sha256(
            b"".join(np.ascontiguousarray(l).tobytes() for l in leaves)
        ).hexdigest()[:16]
        sdigest = hashlib.sha256(
            np.ascontiguousarray(vids).tobytes()).hexdigest()[:16]
        print(f"proc {pid}: [trainer] params-digest-trainer {digest} "
              f"sample-digest-trainer {sdigest}", flush=True)

        # cross-process RESUME: a second Trainer on the same out_dir must
        # agree on the restored step (leader-broadcast latest_step), run
        # the Orbax multi-process restore, and continue bit-identically
        tr2 = Trainer(cfg)
        assert tr2.start_step == 2, tr2.start_step
        tr2.train(total_step=4)
        leaves2 = jax.tree.leaves(jax.device_get(tr2.state["g"]["params"]))
        tr2.close()
        digest2 = hashlib.sha256(
            b"".join(np.ascontiguousarray(l).tobytes() for l in leaves2)
        ).hexdigest()[:16]
        print(f"proc {pid}: [trainer2] params-digest-trainer2 {digest2}",
              flush=True)

    run_trainer_leg()
    # time OUTER so each (data-rank) pair of time shards spans both
    # processes: the DT halo ppermute and time-score psum cross hosts
    run_leg("cp", parallel.make_mesh(
        shape=(2, 2), axis_names=(parallel.TIME_AXIS, parallel.DATA_AXIS)))
    # DVD-GAN-FP on the same cross-process CP topology: clip_len = 4+2 = 6
    # divides the 2-way time axis; the cond-concat full-res DT input
    # (train/step.py fake_full) and fp_enc grads ride the cross-host
    # halo/psum streams — the FP-specific collective paths VERDICT r4
    # flagged as uncovered multi-device.
    run_leg("fp", parallel.make_mesh(
        shape=(2, 2), axis_names=(parallel.TIME_AXIS, parallel.DATA_AXIS)),
        gcfg=GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                     emb_dim=16, attn_res=16, cond_frames=2))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import shutil
    shutil.rmtree("/tmp/dvdgan_mh_trainer", ignore_errors=True)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2"
                        + " --xla_cpu_collective_timeout_seconds=900"
                        ).strip()
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    try:
        # seven digest tags across the legs: several train-step/sample/
        # restore compiles contend on the 1-core host on a cold cache
        # (the persistent cache amortizes repeats)
        outs = [p.communicate(timeout=1800)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:           # don't orphan workers holding the port
            p.kill()
        outs = [p.communicate()[0] or "" for p in procs]
        for i, out in enumerate(outs):
            print(f"--- worker {i} (TIMEOUT) ---\n{out[-1500:]}")
        print("MULTIHOST-SMOKE-FAIL (timeout)")
        sys.exit(1)
    rcs = [p.returncode for p in procs]
    digests: dict[str, list] = {"dp": [], "dplocal": [], "cp": [],
                                "chunk": [], "trainer": [],
                                "trainer2": [], "fp": []}
    sample_digests: list = []
    for i, out in enumerate(outs):
        print(f"--- worker {i} (rc={rcs[i]}) ---")
        print(out[-1500:])
        for line in out.splitlines():
            for tag in digests:
                # token FOLLOWING the marker — .split()[-1] would grab
                # the trainer line's trailing SAMPLE digest instead of
                # its params digest
                marker = f"params-digest-{tag} "
                if marker in line:
                    digests[tag].append(
                        line.split(marker, 1)[1].split()[0])
            if "sample-digest-trainer " in line:
                sample_digests.append(
                    line.split("sample-digest-trainer ", 1)[1].split()[0])
    ok = rcs == [0, 0] and all(
        len(d) == 2 and d[0] == d[1] for d in digests.values())
    # local-input leg must reproduce the full-global-batch leg bitwise
    ok = ok and digests["dp"] and digests["dp"][0] == digests["dplocal"][0]
    # the trainer leg's SAMPLE clips must also agree across processes
    ok = ok and len(sample_digests) == 2 \
        and sample_digests[0] == sample_digests[1]
    print("MULTIHOST-SMOKE-" + ("OK" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
