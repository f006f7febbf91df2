"""End-to-end Trainer integration (BASELINE config 0 / SURVEY §4's
designated smoke: one G+D step + sample, scaled down for the 1-core CPU
runner): train a few steps on synthetic data through the full Trainer
orchestration — loader, jitted step, logging, sample dump, checkpoint —
then auto-resume from the checkpoint."""

import glob
import os

import numpy as np
import pytest

from dvdgan_tpu.train.trainer import Trainer
from dvdgan_tpu.utils.config import Config


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    return Config(dataset="synthetic", n_classes=4, img_size=32, n_frames=4,
                  ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                  total_step=2, log_step=1, sample_step=2,
                  model_save_step=2, ema_start=0, bf16=False, out_dir=out)


def test_trainer_end_to_end(cfg):
    tr = Trainer(cfg)
    metrics = tr.train()
    tr.close()
    assert all(np.isfinite(v) for v in metrics.values())
    # scalar log written
    logf = os.path.join(cfg.out_dir, "logs", "scalars.jsonl")
    assert os.path.getsize(logf) > 0
    # sample artifacts dumped at step 2
    assert glob.glob(os.path.join(cfg.out_dir, "samples", "2_grid.png"))
    assert glob.glob(os.path.join(cfg.out_dir, "samples", "2_sample*.gif"))
    # checkpoint written at step 2
    assert os.path.isdir(os.path.join(cfg.out_dir, "checkpoints", "2"))


def test_trainer_auto_resumes(cfg):
    tr2 = Trainer(cfg)  # same out_dir: must pick up the step-2 checkpoint
    assert tr2.start_step == 2
    m = tr2.train(total_step=3)  # one more step from the restored state
    tr2.close()
    assert all(np.isfinite(v) for v in m.values())


def test_trainer_sample_shape(cfg):
    tr = Trainer(cfg)
    v = np.asarray(tr.sample(), np.float32)
    tr.close()
    assert v.shape == (2, 4, 32, 32, 3)
    assert v.min() >= -1.0 and v.max() <= 1.0


def test_trainer_chunked_matches_per_step(tmp_path):
    """steps_per_call=2 through the FULL Trainer (8-device CPU mesh in
    conftest -> parallel chunked path): same data order, same per-step
    keys -> same final params as per-step dispatch."""
    import jax

    def mk(out, k):
        return Config(dataset="synthetic", n_classes=4, img_size=32,
                      n_frames=4, ch=8, d_ch=8, k_frames=2, batch_size=2,
                      d_steps=1, total_step=2, log_step=2, sample_step=0,
                      model_save_step=0, ema_start=0, bf16=False,
                      steps_per_call=k, out_dir=str(tmp_path / out))

    tr1 = Trainer(mk("a", 1))
    m1 = tr1.train()
    s1 = jax.device_get(tr1.state)
    tr1.close()

    tr2 = Trainer(mk("b", 2))
    assert tr2.steps_per_call == 2
    m2 = tr2.train()
    s2 = jax.device_get(tr2.state)
    tr2.close()

    # chaos-bounded tolerances: see test_chunked_stepping_equivalence's
    # docstring (cross-executable reassociation through Adam's sign-like
    # early updates); losses agree much tighter than params
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=2e-1, atol=6e-3)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-2, atol=1e-3)


def test_trainer_chunked_misaligned_falls_back(tmp_path):
    cfg = Config(dataset="synthetic", n_classes=4, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=4, log_step=3,           # 3 % 2 != 0
                 sample_step=0, model_save_step=0, ema_start=0, bf16=False,
                 steps_per_call=2, out_dir=str(tmp_path / "c"))
    tr = Trainer(cfg)
    assert tr.steps_per_call == 1
    tr.close()


def test_trainer_eval_step_cadence(tmp_path, monkeypatch):
    """--eval_step N runs Trainer.evaluate at N-step boundaries and logs
    the scalars; Trainer.evaluate accepts an extractor override."""
    import json

    from dvdgan_tpu.eval import I3DLikeFeatures

    cfg = Config(dataset="synthetic", n_classes=4, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=2, log_step=2, sample_step=0,
                 model_save_step=0, eval_step=2, ema_start=0, bf16=False,
                 out_dir=str(tmp_path / "ev"))
    tr = Trainer(cfg)
    calls = []
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    real_eval = tr.evaluate
    monkeypatch.setattr(
        tr, "evaluate",
        lambda: calls.append(1) or real_eval(extractor=fx, n_samples=4))
    tr.train()
    tr.close()
    assert calls == [1]
    logged = [json.loads(l) for l in
              open(os.path.join(cfg.out_dir, "logs", "scalars.jsonl"))]
    fvd_rows = [d for d in logged if d["tag"] == "fvd"]
    assert len(fvd_rows) == 1 and fvd_rows[0]["step"] == 2
    assert np.isfinite(fvd_rows[0]["value"])


def test_time_shards_over_devices_rejected(tmp_path):
    """time_shards > device_count must error, not silently fall back to a
    single device (review finding)."""
    import pytest

    cfg = Config(dataset="synthetic", n_classes=4, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=1, time_shards=99, bf16=False,
                 out_dir=str(tmp_path / "ts"))
    with pytest.raises(ValueError, match="time_shards"):
        Trainer(cfg)


def test_sn_diagnostics_keys(tmp_path):
    """Trainer.sn_diagnostics surfaces per-kernel σ (≈1 at orthogonal
    init) and attention γ (0 at init) for all three models — the
    reference's occasional σ/γ telemetry (SURVEY §2.15)."""
    from dvdgan_tpu.train.trainer import Trainer
    from dvdgan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=0, bf16=False, log_sigmas=True, attn_res=16,
                 out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    d = tr.sn_diagnostics()
    tr.close()
    models = {k.split("/")[1] for k in d if k.startswith("sigma/")}
    assert models == {"g", "ds", "dt"}
    gammas = [v for k, v in d.items() if k.startswith("gamma/")]
    assert gammas and all(v == 0.0 for v in gammas)
    convs = [v for k, v in d.items()
             if k.startswith("sigma/") and k.endswith("/w")]
    assert convs and all(abs(v - 1.0) < 0.05 for v in convs)


def test_non_leader_process_writes_nothing(tmp_path, monkeypatch):
    """Multi-host contract: non-leader processes compute everything but
    write NOTHING (no checkpoints/samples/scalars) — N processes writing
    one shared out_dir would race. Simulated by patching process_index."""
    import jax as _jax

    from dvdgan_tpu.train.trainer import Trainer
    from dvdgan_tpu.utils.config import Config

    monkeypatch.setattr(_jax, "process_index", lambda: 1)
    out = tmp_path / "run"
    # model_save_step=0: checkpoint writes are NOT leader-gated (Orbax's
    # save is a multi-process collective that elects its own primary
    # writer — every process must call it; see the multihost smoke's
    # trainer leg for the real cross-process checkpoint validation)
    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=8, d_steps=1,
                 total_step=2, log_step=1, sample_step=2,
                 model_save_step=0, ema_start=0, bf16=False,
                 out_dir=str(out))
    tr = Trainer(cfg)
    assert tr.is_main is False
    m = tr.train()
    tr.close()
    assert np.isfinite(m["g_loss"])
    assert int(_jax.device_get(tr.state["step"])) == 2   # computed fully
    assert not out.exists()                             # wrote nothing


def test_n_devices_caps_mesh(tmp_path):
    """--n_devices N restricts the DP mesh to the first N devices (pod
    scaling studies); oversubscription errors loudly."""
    import pytest

    def mk(n):
        return Config(dataset="synthetic", n_classes=3, img_size=32,
                      n_frames=4, ch=8, d_ch=8, k_frames=2, batch_size=4,
                      d_steps=1, total_step=1, log_step=1, sample_step=0,
                      model_save_step=0, ema_start=0, bf16=False,
                      n_devices=n, out_dir=str(tmp_path / f"d{n}"))

    tr = Trainer(mk(2))
    assert tr.n_devices == 2
    assert tr.mesh is not None and tr.mesh.devices.size == 2
    m = tr.train()
    tr.close()
    assert np.isfinite(m["g_loss"])
    with pytest.raises(ValueError, match="n_devices"):
        Trainer(mk(99))


def test_trainer_frames_dataset_end_to_end(tmp_path):
    """main.py-equivalent composition: Trainer over a real on-disk
    FrameFolderDataset (.npy videos, C++ clip assembly, threaded loader)
    — the frames preset path, previously only covered piecewise."""
    data = tmp_path / "data"
    rng = np.random.RandomState(0)
    for c in range(2):
        cdir = data / f"class{c}"
        cdir.mkdir(parents=True)
        for v in range(4):
            np.save(cdir / f"vid{v}.npy",
                    rng.randint(0, 256, (10, 48, 48, 3), dtype=np.uint8))

    cfg = Config(dataset="frames", data_path=str(data), n_classes=2,
                 img_size=32, n_frames=4, ch=8, d_ch=8, k_frames=2,
                 batch_size=4, d_steps=1, total_step=2, log_step=1,
                 sample_step=0, model_save_step=2, ema_start=0,
                 bf16=False, out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    m = tr.train()
    tr.close()
    assert all(np.isfinite(v) for v in m.values())
    assert os.path.isdir(os.path.join(cfg.out_dir, "checkpoints", "2"))
    # n_classes mismatch is refused loudly
    bad = Config(dataset="frames", data_path=str(data), n_classes=7,
                 img_size=32, n_frames=4, ch=8, d_ch=8, batch_size=4,
                 bf16=False, out_dir=str(tmp_path / "run2"))
    with pytest.raises(ValueError, match="n_classes"):
        Trainer(bad)


def test_step_times_summary_and_host_keys_knob(tmp_path, monkeypatch):
    """DVDGAN_STEP_TIMES writes a percentile summary; DVDGAN_HOST_KEYS=off
    (the on-device fold_in A/B path) produces the SAME final params as the
    default host-CPU key derivation — threefry fold_in is
    platform-independent bit math, so the keys are bitwise identical."""
    import json

    import jax

    def run(out, host_keys, times="", overlap="on"):
        monkeypatch.setenv("DVDGAN_HOST_KEYS", host_keys)
        monkeypatch.setenv("DVDGAN_H2D_OVERLAP", overlap)
        if times:
            monkeypatch.setenv("DVDGAN_STEP_TIMES", times)
        else:
            monkeypatch.delenv("DVDGAN_STEP_TIMES", raising=False)
        cfg = Config(dataset="synthetic", n_classes=4, img_size=32,
                     n_frames=4, ch=8, d_ch=8, k_frames=2, batch_size=2,
                     d_steps=1, total_step=3, log_step=3, sample_step=0,
                     model_save_step=0, ema_start=0, bf16=False,
                     out_dir=str(tmp_path / out))
        tr = Trainer(cfg)
        tr.train()
        s = jax.device_get(tr.state)
        tr.close()
        return s

    times_path = str(tmp_path / "times.json")
    s_on = run("hk_on", "on", times=times_path)
    s_off = run("hk_off", "off")
    # H2D overlap (one-ahead placement on a side thread) must not change
    # batch order or keys: bitwise vs the default-on runs above
    s_noov = run("no_overlap", "on", overlap="off")

    # bitwise: same executable, same data, identical keys
    for a, b, c2 in zip(jax.tree.leaves(s_on), jax.tree.leaves(s_off),
                        jax.tree.leaves(s_noov)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c2))

    summary = json.load(open(times_path))
    assert summary["calls"] == 2 and summary["steps_per_call"] == 1
    assert summary["first_call_s"] > 0 and summary["median_s"] > 0
    assert summary["median_steps_per_s"] > 0
    # nearest-rank percentiles: monotone, and the 2-sample median is the
    # LOWER sample (int(p*n) indexing used to return the max for both)
    assert summary["median_s"] <= summary["p90_s"] <= summary["p99_s"] \
        <= summary["max_s"]
    assert summary["median_s"] <= summary["mean_s"]


def test_daemon_prefetcher_semantics():
    """The one-ahead H2D prefetcher runs on a DAEMON thread (a hung decode
    must not block interpreter exit via concurrent.futures' atexit join —
    ADVICE r3), propagates fn exceptions at result(), and shutdown() never
    blocks even with a slow fn in flight."""
    import threading as _th
    import time as _time

    from dvdgan_tpu.train.trainer import _DaemonPrefetcher

    p = _DaemonPrefetcher()
    assert p._th.daemon
    assert p.submit(lambda: 41 + 1).result() == 42

    def boom():
        raise RuntimeError("decode failed")

    p.submit(boom)
    with pytest.raises(RuntimeError, match="decode failed"):
        p.result()

    release, started = _th.Event(), _th.Event()

    def slow():
        started.set()
        return release.wait(5)

    p.submit(slow)
    started.wait(5)                   # fn is RUNNING when shutdown lands
    t0 = _time.perf_counter()
    p.shutdown()                      # must not wait for the slow fn
    assert _time.perf_counter() - t0 < 1.0
    release.set()
    assert p.result() is True         # in-flight fn still completed
    p._th.join(5)
    assert not p._th.is_alive()       # worker exited after the flag/None
