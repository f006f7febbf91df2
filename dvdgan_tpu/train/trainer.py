"""Trainer orchestration (SURVEY.md §2.10, §3.1 control flow).

`Trainer(config).train()` mirrors the reference's [R trainer.py] surface:
builds models/optimizers (create or resume), iterates the data loader,
runs the jitted alternating G/D step, and on the reference's schedule flags
(log_step / sample_step / model_save_step) writes scalars, dumps EMA-G
sample GIFs/grids, and checkpoints. Auto-resumes from the latest checkpoint
(preemption safety, SURVEY §5.3) or from --pretrained_model.

Device strategy: with >1 visible device the step runs shard_map'd over a
1-D `data` mesh (grad psum + cross-replica BN); single-device uses the plain
jitted step. Either way the host loop only touches numpy batches and
device_put's them with the right sharding.

Multi-host: every process executes the same SPMD program; only process 0
writes scalars/samples, while checkpoint saves are called by EVERY process
(Orbax's save is a multi-process collective that elects the primary
writer). Resume assumes --out_dir is on storage all hosts can read — the
standard pod setup; with host-local disks, distribute the leader's
checkpoint before restarting.
"""

from __future__ import annotations

import functools
import os
import queue
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from dvdgan_tpu import parallel
from dvdgan_tpu.data import FrameFolderDataset, Loader, SyntheticVideoDataset
from dvdgan_tpu.train import checkpoint as ckpt
from dvdgan_tpu.train import state as train_state
from dvdgan_tpu.train import step as step_mod
from dvdgan_tpu.utils.config import Config
from dvdgan_tpu.utils.logging import (MetricWriter, NullWriter,
                                      step_line)
from dvdgan_tpu.utils.media import save_batch_gifs, save_video_grid_png


class _DaemonPrefetcher:
    """Single-slot one-ahead H2D prep on a persistent DAEMON thread.

    concurrent.futures' ThreadPoolExecutor workers are non-daemon and the
    module's atexit hook JOINS them at interpreter exit — a decode/placement
    hung in the axon tunnel (a known failure mode here) would then block
    process exit even after training completed (ADVICE r3). A daemon thread
    lets exit proceed; the in-flight batch is simply dropped. The interface
    mirrors the one Executor call pattern the trainer uses:
    `pending = pool.submit(fn)` … `pending.result()` (at most one in
    flight — the trainer consumes before resubmitting)."""

    def __init__(self):
        self._in: queue.Queue = queue.Queue(1)
        self._out: queue.Queue = queue.Queue(1)
        self._closed = False
        self._th = threading.Thread(target=self._run, daemon=True,
                                    name="h2d-prefetch")
        self._th.start()

    def _run(self):
        while True:
            fn = self._in.get()
            if fn is None or self._closed:
                return   # a fn submitted but not yet started is dropped
            try:
                self._out.put((True, fn()))
            except BaseException as e:   # surfaced at result(), like Future
                self._out.put((False, e))
            if self._closed:
                return   # shutdown raced our dequeue: its None was dropped

    def submit(self, fn):
        self._in.put(fn)
        return self

    def result(self):
        ok, v = self._out.get()
        if ok:
            return v
        raise v

    def shutdown(self):
        """Ask the worker to exit; never blocks. A RUNNING fn finishes on
        its own first (a hung one is covered by the daemon flag at
        interpreter exit); the flag covers the race where the None sentinel
        is dropped because a submitted-but-unstarted fn still occupies the
        single queue slot."""
        self._closed = True
        try:
            self._in.put_nowait(None)
        except queue.Full:
            pass


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.g_cfg = cfg.g_config()
        self.ds_cfg = cfg.ds_config()
        self.dt_cfg = cfg.dt_config()
        self.tc = cfg.train_config()

        self.out_dir = cfg.out_dir
        self.ckpt_dir = os.path.join(self.out_dir, "checkpoints")
        self.sample_dir = os.path.join(self.out_dir, "samples")
        # multi-host: every process COMPUTES everything (jit over global
        # arrays is SPMD — all processes must execute the same program),
        # but only the leader WRITES (checkpoints, samples, scalars) — N
        # processes writing one shared out_dir would race/corrupt
        self.is_main = jax.process_index() == 0
        if self.is_main:
            os.makedirs(self.out_dir, exist_ok=True)
            self.writer = MetricWriter(os.path.join(self.out_dir, "logs"))
        else:
            self.writer = NullWriter()

        self.dataset = self._build_dataset()
        # async checkpointing is SINGLE-PROCESS only: Orbax's save is a
        # multi-process collective (every process must call it; Orbax
        # elects the primary writer), and running that barrier on a
        # background thread would interleave its collectives with the
        # main thread's train-step collectives in a process-dependent
        # order — multihost uses the synchronous path instead.
        self.saver = (ckpt.AsyncSaver()
                      if cfg.async_save and jax.process_count() == 1
                      else None)
        if cfg.async_save and self.saver is None and self.is_main:
            print("async_save: multi-process run uses synchronous "
                  "checkpointing (Orbax's save barrier cannot run on a "
                  "background thread)")

        key = jax.random.PRNGKey(cfg.seed)
        self.state = train_state.create(key, self.g_cfg, self.ds_cfg,
                                        self.dt_cfg, self.tc)
        self.start_step = 0
        self._maybe_resume()

        # data-parallel over as many devices as divide the global batch;
        # with time_shards > 1 the mesh is 2-D (data × time) and DT runs
        # context-parallel over the clip (SURVEY §5.7)
        n_time = max(1, cfg.time_shards)
        avail = jax.device_count()
        if cfg.n_devices > 0:
            if jax.process_count() > 1:
                raise ValueError(
                    "--n_devices is single-process only: capping to the "
                    "first N of the globally-ordered device list would "
                    "strand the other hosts' processes (shrink the "
                    "cluster instead)")
            if cfg.n_devices > avail:
                raise ValueError(f"--n_devices {cfg.n_devices} > "
                                 f"{avail} visible devices")
            avail = cfg.n_devices
        if n_time > 1 and avail < n_time:
            raise ValueError(
                f"time_shards={n_time} needs at least that many devices; "
                f"have {avail} (refusing to silently drop "
                "the requested context parallelism)")
        n_data = avail // n_time
        while n_data > 1 and cfg.batch_size % n_data:
            n_data -= 1
        self.n_devices = n_data * n_time
        self.steps_per_call = self._effective_steps_per_call()
        if self.n_devices > 1:
            if n_time > 1:
                self.mesh = parallel.make_mesh(
                    (n_data, n_time), ("data", "time"),
                    devices=jax.devices()[:self.n_devices])
            else:
                self.mesh = parallel.make_mesh(
                    devices=jax.devices()[:self.n_devices])
            self.state = parallel.replicate_state(self.mesh, self.state)
            self.step_fn = parallel.make_parallel_train_step(
                self.g_cfg, self.ds_cfg, self.dt_cfg, self.tc, self.mesh,
                steps_per_call=self.steps_per_call)
        else:
            self.mesh = None
            if self.steps_per_call > 1:
                raw = functools.partial(
                    step_mod.train_step, g_cfg=self.g_cfg,
                    ds_cfg=self.ds_cfg, dt_cfg=self.dt_cfg, tc=self.tc)
                self.step_fn = step_mod.scan_steps(raw, self.steps_per_call)
            else:
                self.step_fn = step_mod.make_train_step(
                    self.g_cfg, self.ds_cfg, self.dt_cfg, self.tc)

        # multi-host input sharding: every process computes the same global
        # shuffle but decodes ONLY the rows its devices own (pod-scale
        # hosts don't pay global-batch decode); single-process loads all
        self._local_rows = None
        if self.mesh is not None and jax.process_count() > 1:
            self._local_rows = parallel.local_batch_rows(self.mesh,
                                                         cfg.batch_size)
        self.loader = Loader(self.dataset, cfg.batch_size, seed=cfg.seed,
                             rows=self._local_rows,
                             num_threads=cfg.loader_threads,
                             prefetch=cfg.prefetch)

        # fixed eval latents/labels for comparable sample dumps over training
        kz, ky = jax.random.split(jax.random.PRNGKey(cfg.seed + 1))
        n_show = min(4, cfg.batch_size)
        self.z_fixed = jax.random.normal(kz, (n_show, self.g_cfg.z_dim))
        self.y_fixed = jax.random.randint(ky, (n_show,), 0, cfg.n_classes)
        # FP: a fixed real prefix from the dataset conditions the dumps
        self.cond_fixed = None
        if self.g_cfg.cond_frames > 0:
            self.cond_fixed = jnp.asarray(np.stack(
                [self.dataset[i][0][:self.g_cfg.cond_frames]
                 for i in range(n_show)]))
        self._sample_jit = jax.jit(step_mod.sample, static_argnames=("g_cfg",))

    def _effective_steps_per_call(self) -> int:
        """Validate chunked stepping against the schedule: every cadence
        (log/sample/save/total, resume point) must land on a chunk
        boundary, or chunking silently shifts the reference's schedule
        semantics. Misaligned configs fall back to 1 with a warning rather
        than erroring (correctness over speed)."""
        k = max(1, self.cfg.steps_per_call)
        if k == 1:
            return 1
        cadences = [self.cfg.total_step, self.cfg.log_step,
                    self.cfg.sample_step, self.cfg.model_save_step,
                    self.cfg.eval_step, self.start_step]
        bad = [c for c in cadences if c and c % k]
        if bad:
            print(f"steps_per_call={k} does not divide schedule points "
                  f"{bad}; falling back to per-step dispatch")
            return 1
        return k

    # ------------------------------------------------------------------ data
    def _build_dataset(self):
        c = self.cfg
        if c.dataset == "synthetic":
            return SyntheticVideoDataset(
                n_items=max(c.batch_size * 8, 64), n_frames=c.n_frames,
                img_size=c.img_size, n_classes=c.n_classes, seed=c.seed)
        if c.dataset == "frames":
            ds = FrameFolderDataset(c.data_path, c.n_frames, c.img_size,
                                    seed=c.seed, npy_range=c.npy_range)
            if ds.n_classes != c.n_classes:
                raise ValueError(
                    f"--n_classes {c.n_classes} != {ds.n_classes} classes "
                    f"found under {c.data_path}")
            return ds
        raise ValueError(f"unknown dataset {c.dataset!r}")

    # ---------------------------------------------------------------- resume
    def _maybe_resume(self):
        step = self.cfg.pretrained_model
        if step is None:
            step = ckpt.latest_step(self.ckpt_dir)
        if jax.process_count() > 1:
            # all processes must restore the SAME step: a directory
            # listing racing a checkpoint write (or an unsynced shared
            # FS) could give hosts different answers — divergent states
            # and a collective mismatch later. The leader's answer wins.
            from jax.experimental import multihost_utils
            s = int(multihost_utils.broadcast_one_to_all(
                jnp.asarray(-1 if step is None else step, jnp.int32)))
            step = None if s < 0 else s
        if step is not None:
            self.state = ckpt.restore(self.ckpt_dir, step, self.state)
            self.start_step = int(step)
            if self.is_main:
                print(f"resumed from checkpoint step {step}")

    # ----------------------------------------------------------------- train
    def train(self, total_step: int | None = None) -> dict:
        c = self.cfg
        if c.nan_check:
            jax.config.update("jax_debug_nans", True)
        total = total_step if total_step is not None else c.total_step
        # resume the data stream EXACTLY where it left off: position is a
        # pure function of the restored step (one batch per step; shuffle
        # order is a pure function of (seed, epoch)), so an interrupted
        # run replays the identical batch sequence the uninterrupted run
        # would have seen. (The reference loses the loader position
        # entirely on resume, SURVEY §3.5.)
        bpe = max(self.loader.batches_per_epoch(), 1)
        data = self.loader.forever(start_epoch=self.start_step // bpe,
                                   start_batch=self.start_step % bpe)
        metrics = {}
        lagged = None   # (step, metrics) from log_step ago: fetching them is
        #                 free (that step already finished) so the log-step
        #                 sync never stalls the device pipeline
        t_last = time.time()
        dtype = jnp.bfloat16 if c.bf16 else jnp.float32
        # per-step keys are derived ON THE HOST CPU backend: fold_in is
        # platform-independent threefry bit math (identical values), but
        # computed eagerly on the accelerator it costs 2 extra device
        # executes per step — through the axon tunnel's ~20-30 ms
        # per-execute floor that alone capped the trainer at 14-18
        # steps/s vs the device's ~25 (round-3 measurement). np.asarray
        # keeps the key uncommitted so it rides the step dispatch.
        from dvdgan_tpu.ops.layers import env_choice
        host_keys = env_choice("DVDGAN_HOST_KEYS", "on", ("on", "off"))
        if host_keys == "on":
            try:   # CPU-less platform configs (JAX_PLATFORMS=tpu): the
                #    knob quietly degrades. LOCAL devices: in a
                #    multi-process CPU cluster jax.devices("cpu")[0] is
                #    process 0's device — non-addressable elsewhere, and
                #    np.asarray(fold_in(...)) on it raises (caught by the
                #    r5 multihost smoke's trainer leg).
                cpu0 = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                host_keys = "off"
        if host_keys == "on":
            with jax.default_device(cpu0):
                base_key_cpu = jax.random.PRNGKey(c.seed)
        base_key = jax.random.PRNGKey(c.seed)   # chunked path: built once

        # DVDGAN_STEP_TIMES=<path.json>: record per-iteration host wall
        # times and write a percentile summary at the end. Through the
        # axon tunnel the INTERVAL steps/s is stall-noise dominated (one
        # multi-second hiccup poisons a 50-step mean); the median here is
        # the honest per-step number — in steady state dispatch
        # backpressure makes it track device time.
        _times_path = os.environ.get("DVDGAN_STEP_TIMES", "")
        step_times = [] if _times_path else None

        K = self.steps_per_call
        if K > 1 and total % K:
            raise ValueError(f"total_step override {total} is not a "
                             f"multiple of steps_per_call {K}")

        # H2D overlap (K=1 path): batch i+1's decode-fetch + astype +
        # device placement run on a side thread while step i executes —
        # the critical path becomes max(device, host-prep) instead of the
        # sum. At 256px/48f a batch is ~150 MB: host astype + transfer
        # serialization alone is several hundred ms on the 1-core host.
        # Placement is process-local (make_array_from_process_local_data
        # issues no collectives), so the worker can never interleave a
        # collective with the train step's — multihost-safe.
        def place(batch):
            clip_, labels_ = batch
            clip_ = clip_.astype(dtype)
            if self.mesh is not None:
                if self._local_rows is not None:
                    return parallel.shard_batch_local(
                        self.mesh, clip_, labels_, c.batch_size)
                return parallel.shard_batch(self.mesh, clip_, labels_)
            return jnp.asarray(clip_), jnp.asarray(labels_)

        overlap = (K == 1 and env_choice("DVDGAN_H2D_OVERLAP", "on",
                                         ("on", "off")) == "on")
        h2d_pool = None
        pending = None
        if overlap:
            h2d_pool = _DaemonPrefetcher()
        prof_start = self.start_step + K * max(1, 10 // K)
        prof_stop = prof_start + K * max(1, 5 // K)
        try:
            for i in range(self.start_step, total, K):
                if step_times is not None:
                    _t_iter = time.time()
                if c.profile and i == prof_start:
                    jax.profiler.start_trace(os.path.join(self.out_dir, "trace"))
                if c.profile and i == prof_stop:
                    # true device barrier: fetch a scalar — block_until_ready
                    # does NOT synchronize through the axon tunnel (CLAUDE.md),
                    # which would truncate the trace mid-step
                    self._metrics_host(metrics)
                    jax.profiler.stop_trace()
                if K == 1:
                    if pending is not None:
                        real, y = pending.result()
                        pending = None
                    else:
                        real, y = place(next(data))
                    if overlap and i + K < total:
                        # one-ahead: prep batch i+1 while step i runs
                        pending = h2d_pool.submit(lambda: place(next(data)))
                    # per-step key from (seed, step): resume-stable streams
                    if host_keys == "on":
                        with jax.default_device(cpu0):
                            key = np.asarray(
                                jax.random.fold_in(base_key_cpu, i))
                    else:   # measured-loser path kept for A/B (2 extra
                        #     device executes per step through the tunnel)
                        key = jax.random.fold_in(base_key, i)
                    self.state, metrics = self.step_fn(self.state, real, y, key)
                else:
                    # chunked stepping: K batches, ONE dispatch; per-step keys
                    # fold_in(seed, step) are derived on-device inside the
                    # scan (host-side key building / metric slicing would cost
                    # one tunnel round-trip per step — the very overhead being
                    # amortized). `metrics` stays a stacked device tree until
                    # a log boundary actually reads it.
                    bs = [next(data) for _ in range(K)]
                    clips = np.stack([b[0] for b in bs]).astype(dtype)
                    ys = np.stack([b[1] for b in bs])
                    if self.mesh is not None:
                        if self._local_rows is not None:
                            real, y = parallel.shard_batch_chunk_local(
                                self.mesh, clips, ys, c.batch_size)
                        else:
                            real, y = parallel.shard_batch_chunk(self.mesh,
                                                                 clips, ys)
                    else:
                        real, y = jnp.asarray(clips), jnp.asarray(ys)
                    self.state, metrics = self.step_fn(
                        self.state, real, y, base_key,
                        jnp.asarray(i, jnp.int32))
                if step_times is not None:
                    # data prep + key + dispatch; excludes log/eval/save.
                    # The LAST interval fetches a device scalar first: the
                    # async dispatch queue must drain into a timed window,
                    # otherwise mean_steps_per_s could overcount by however
                    # deep the device had fallen behind the host loop
                    if i + K >= total:
                        # scalar FETCH, not block_until_ready (which does
                        # not synchronize through the axon tunnel)
                        float(np.asarray(
                            jax.tree.leaves(metrics)[0]).ravel()[0])
                    step_times.append(time.time() - _t_iter)

                step = i + K
                if step % c.log_step == 0:
                    report_step, report = lagged if lagged is not None \
                        else (step, metrics)
                    m = self._metrics_host(report)
                    dt = time.time() - t_last
                    sps = c.log_step / dt if dt > 0 else 0.0
                    t_last = time.time()
                    # both curves at report_step: the sps window just measured
                    # ends at the lagged step's device completion
                    self.writer.scalars(m, report_step)
                    self.writer.scalar("steps_per_sec", sps, report_step)
                    if self.is_main:
                        print(step_line(report_step, m, sps))
                    lagged = (step, metrics)
                if c.sample_step and step % c.sample_step == 0:
                    # dump_samples COMPUTES on every process (the sample
                    # jit is a global SPMD computation — a leader-only
                    # call would desync the processes' collective
                    # streams) and writes files on the leader only
                    self.dump_samples(step)
                    if c.log_sigmas:   # the reference's occasional σ/γ lines
                        self.writer.scalars(self.sn_diagnostics(), step)
                if c.eval_step and step % c.eval_step == 0:
                    ev = self.evaluate()
                    self.writer.scalars(ev, step)
                    if self.is_main:
                        print(f"eval @ {step}: " + " ".join(
                            f"{k} {v:.4f}" for k, v in ev.items()))
                if c.model_save_step and step % c.model_save_step == 0:
                    # EVERY process calls save — Orbax's save is itself a
                    # multi-process collective and elects the primary
                    # writer (leader-only calls deadlock its barrier)
                    if self.saver is not None:
                        self.saver.save(self.ckpt_dir, step, self.state,
                                        max_to_keep=c.keep_checkpoints or None)
                    else:
                        ckpt.save(self.ckpt_dir, step,
                                  jax.device_get(self.state),
                                  max_to_keep=c.keep_checkpoints or None)
        except BaseException:
            # flush on unwind too (a daemon writer thread dies with the
            # process; the sync path always finished) — but a flush
            # failure here must not mask the propagating error
            self._flush_saver(unwinding=True)
            raise
        finally:
            if h2d_pool is not None:
                # non-blocking; an in-flight decode finishes on its own
                # (nothing consumes it) and its DAEMON thread cannot block
                # interpreter exit even if the decode hangs
                h2d_pool.shutdown()
        # normal completion: the final checkpoint must be durable and a
        # failed write must FAIL the run (explicit flag, not
        # sys.exc_info() sniffing — train() may legitimately be called
        # from inside an except handler, e.g. a preemption-retry wrapper)
        self._flush_saver(unwinding=False)
        if step_times is not None and self.is_main and len(step_times) > 1:
            import json as _json
            import math as _math
            # [0] is excluded from the percentiles: on a cold run it is
            # the trace+compile (minutes); on a warm-cache/resume run it
            # is an ordinary step (a conservative one-sample exclusion) —
            # "first_call_s", not "compile_s": only the cold case compiles
            per_call = sorted(step_times[1:])
            # nearest-rank percentile (ceil(p*n)): int(p*n) returned the
            # MAX for p90/p99 of small samples and the larger of 2 medians
            q = lambda p: per_call[max(0, _math.ceil(p * len(per_call)) - 1)]
            summary = {
                "calls": len(per_call), "steps_per_call": K,
                "first_call_s": step_times[0],
                "median_s": q(0.5), "p90_s": q(0.9), "p99_s": q(0.99),
                "max_s": per_call[-1],
                "mean_s": sum(per_call) / len(per_call),
                "median_steps_per_s": K / q(0.5) if q(0.5) > 0 else 0.0,
                "mean_steps_per_s": (K * len(per_call) / sum(per_call)
                                     if sum(per_call) > 0 else 0.0),
            }
            print("step-time summary:", _json.dumps(summary))
            try:   # best-effort diagnostics: a bad path must not fail a
                with open(_times_path, "w") as f:   # completed run
                    _json.dump(summary, f, indent=1)
            except OSError as e:
                print(f"DVDGAN_STEP_TIMES write failed: {e}",
                      file=sys.stderr)
        if lagged is not None:   # final interval's metrics, never yet written
            lstep, lmetrics = lagged
            self.writer.scalars(self._metrics_host(lmetrics), lstep)
        return self._metrics_host(metrics) if metrics else {}

    # ------------------------------------------------------------------ eval
    def evaluate(self, extractor=None, n_samples: int | None = None) -> dict:
        """FVD (+IS via the shared I3D logits) of EMA-G samples vs the
        dataset — the --mode eval path, callable mid-training
        (--eval_step cadence). The extractor is built once and cached;
        pass one explicitly to override (tests use a tiny
        I3DLikeFeatures). Random-init extractors give self-consistent
        TRENDS, not published-comparable numbers (see --mode eval's
        labeling)."""
        from dvdgan_tpu.eval import (I3DClassifierProbs, I3DFeatures,
                                     compute_real_features,
                                     evaluate_generator)
        if extractor is None:
            if not hasattr(self, "_eval_fx"):
                self._eval_fx = I3DFeatures(
                    weights_npz=self.cfg.i3d_weights or None, seed=0)
                self._eval_clf = I3DClassifierProbs(
                    feature_extractor=self._eval_fx)
            extractor, clf = self._eval_fx, self._eval_clf
        else:
            clf = None
        n = min(n_samples if n_samples is not None
                else self.cfg.eval_samples, len(self.dataset))
        # the real side is fixed for the life of the run (same dataset,
        # same extractor): embed it once, reuse across --eval_step evals.
        # Keyed on the extractor OBJECT (identity hash — also pins it
        # against GC; an id() key could be recycled to a new extractor)
        ck = (extractor, n)
        if not hasattr(self, "_real_feats"):
            self._real_feats = {}
        if ck not in self._real_feats:
            self._real_feats[ck] = compute_real_features(
                self.dataset, extractor, n,
                batch_size=min(self.cfg.batch_size, n))
        return evaluate_generator(
            self, extractor, n_samples=n,
            batch_size=min(self.cfg.batch_size, n), classifier=clf,
            real_features=self._real_feats[ck])

    def _flush_saver(self, unwinding: bool = False):
        """Join the in-flight async checkpoint write. On the normal path a
        background failure propagates; with unwinding=True (called from an
        except block) it is printed instead, so it cannot mask the
        original error."""
        if self.saver is None:
            return
        if not unwinding:
            self.saver.wait()
            return
        try:
            self.saver.wait()
        except Exception as e:
            print(f"async checkpoint flush failed during teardown: {e}")

    def sn_diagnostics(self) -> dict:
        """σ of every spectrally-normalized kernel (from the persistent u,
        not advanced) + every attention γ — the reference trainer's
        occasional TensorBoard telemetry (SURVEY §2.15). One small jitted
        pass over the state; fired at --sample_step cadence when
        --log_sigmas is on."""
        from dvdgan_tpu.core import tree as tru
        from dvdgan_tpu.ops import spectral_norm as sn

        if not hasattr(self, "_diag_jit"):
            def diag(state):
                out = {}
                for m in ("g", "ds", "dt"):
                    sig = sn.sn_sigmas(state[m]["params"],
                                       state[m]["sn_u"])
                    out.update({f"sigma/{m}/{p}": v
                                for p, v in sig.items()})
                    flat = tru.flatten_with_paths(state[m]["params"])
                    out.update({f"gamma/{m}/{p}": v
                                for p, v in flat.items()
                                if p.rsplit("/", 1)[-1] == "gamma"})
                return out
            self._diag_jit = jax.jit(diag)
        return {k: float(v) for k, v in
                jax.device_get(self._diag_jit(self.state)).items()}

    @staticmethod
    def _metrics_host(metrics) -> dict:
        """Device metrics -> {name: float} in ONE device_get; chunked
        stepping stacks a leading step axis — report the interval's final
        step (matching the per-step path, which only ever logs the
        boundary step's metrics)."""
        host = jax.device_get(metrics)
        return {k: float(np.asarray(v).reshape(-1)[-1])
                for k, v in host.items()}

    # ---------------------------------------------------------------- sample
    def sample(self, z=None, y=None, cond=None):
        """EMA-G inference (SURVEY §3.4). Returns (B, T, H, W, 3) in [-1,1]
        — generated frames only; FP conditions on `cond` (default: the
        fixed dataset prefix)."""
        st = self.state
        z = self.z_fixed if z is None else z
        y = self.y_fixed if y is None else y
        if cond is None:
            cond = (None if self.cond_fixed is None
                    else self.cond_fixed[:z.shape[0]])
        if self.mesh is not None:
            # the state is GLOBAL (replicated over the mesh); z/y/cond are
            # per-process host arrays. Multi-host jit requires every
            # argument to be a global array — replicate them onto the same
            # mesh (every process builds identical values: fixed seeds).
            # Single-host this is a no-op placement.
            rep = parallel.replicated(self.mesh)
            z, y = jax.device_put(z, rep), jax.device_put(y, rep)
            if cond is not None:
                cond = jax.device_put(cond, rep)
        return self._sample_jit(st["g_ema"], st["g"]["stats"],
                                st["g"]["sn_u"], z, y, cond_video=cond,
                                g_cfg=self.g_cfg)

    def dump_samples(self, step: int):
        # compute on ALL processes (global SPMD program: the jit call
        # itself must run everywhere) — but only the leader pays the
        # device->host fetch and the file writes
        videos_dev = self.sample()
        if not self.is_main:
            return
        videos = np.asarray(jax.device_get(videos_dev), np.float32)
        save_video_grid_png(
            os.path.join(self.sample_dir, f"{step}_grid.png"), videos)
        save_batch_gifs(self.sample_dir, videos, step)

    def close(self):
        if self.saver is not None:
            self.saver.wait()
        self.writer.close()
