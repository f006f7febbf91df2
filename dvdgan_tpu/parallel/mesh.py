"""Device mesh + data-parallel train step (SURVEY.md §2.16, §5.8).

XLA collectives are the comm backend — there is no NCCL/MPI analog to port.
The strategy (matching the original paper's TPU system, not the reference's
single-process nn.DataParallel): a 1-D `data` mesh; batch sharded over it;
parameters/optimizer state replicated; gradients `pmean`ed over ICI inside
the step; BatchNorm moments `pmean`ed too (cross-replica BN — the one
collective the model itself needs, SURVEY §2.16).

The mesh API keeps an optional `model` axis seam for tensor parallelism
(SURVEY §2 checklist): `make_mesh((8, 1), ("data", "model"))` — unused by
DVD-GAN but the train-step wrapper only touches the `data` axis, so a model
axis can be layered on later without changing this file's contract.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh then spans all processes' devices and the same shard_map program runs
ICI collectives within a slice and DCN-hierarchical reductions across slices
(XLA handles the hierarchy from the device topology).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.train import step as train_step_mod
from dvdgan_tpu.train.state import TrainConfig

DATA_AXIS = "data"
TIME_AXIS = "time"


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,)
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, clip: np.ndarray, labels: np.ndarray):
    """Host batch -> device arrays, batch-sharded over the mesh."""
    s = batch_sharding(mesh)
    return jax.device_put(clip, s), jax.device_put(labels, s)


def shard_batch_chunk(mesh: Mesh, clips: np.ndarray, labels: np.ndarray):
    """(steps_per_call, B, ...) host chunk -> device arrays with the BATCH
    axis (dim 1) sharded over `data`; the leading step axis is unsharded
    (it is lax.scan's carry axis in chunked stepping)."""
    s = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.device_put(clips, s), jax.device_put(labels, s)


def local_batch_rows(mesh: Mesh, global_batch: int) -> Tuple[int, int]:
    """The contiguous [start, stop) block of the global batch whose rows
    live on THIS process's devices under `batch_sharding(mesh)`. The
    multi-host input contract (SURVEY §5.8): every host computes the same
    global shuffle (pure function of (seed, epoch)) but decodes only
    these rows — `Loader(rows=...)` + `shard_batch_local` — instead of
    materializing the full global batch per host."""
    s = batch_sharding(mesh)
    m = s.devices_indices_map((global_batch,))
    mine = [idx[0] for d, idx in m.items()
            if d.process_index == jax.process_index()]
    if not mine:
        raise ValueError("this process owns no devices in the mesh")
    ranges = sorted({(sl.start or 0,
                      global_batch if sl.stop is None else sl.stop)
                     for sl in mine})
    start, stop = ranges[0][0], ranges[-1][1]
    pos = start
    for a, b in ranges:   # replicated axes (e.g. time) repeat ranges —
        if a > pos:       # fine; holes are not
            raise ValueError(
                f"process-local batch rows are not contiguous: {ranges} "
                "(reorder the mesh so the data axis keeps process blocks "
                "contiguous)")
        pos = max(pos, b)
    return start, stop


def shard_batch_local(mesh: Mesh, clip: np.ndarray, labels: np.ndarray,
                      global_batch: int):
    """Process-LOCAL batch rows (`local_batch_rows`-sized) -> GLOBAL
    batch-sharded device arrays. Multi-host sibling of `shard_batch`."""
    s = batch_sharding(mesh)
    return (jax.make_array_from_process_local_data(
                s, clip, (global_batch,) + clip.shape[1:]),
            jax.make_array_from_process_local_data(
                s, labels, (global_batch,) + labels.shape[1:]))


def shard_batch_chunk_local(mesh: Mesh, clips: np.ndarray,
                            labels: np.ndarray, global_batch: int):
    """Multi-host sibling of `shard_batch_chunk`: (steps_per_call,
    local_rows, ...) -> global arrays with dim 1 sharded over `data`."""
    s = NamedSharding(mesh, P(None, DATA_AXIS))
    return (jax.make_array_from_process_local_data(
                s, clips, clips.shape[:1] + (global_batch,)
                + clips.shape[2:]),
            jax.make_array_from_process_local_data(
                s, labels, labels.shape[:1] + (global_batch,)
                + labels.shape[2:]))


def replicate_state(mesh: Mesh, state):
    """Replicate a per-process state tree onto the mesh. Goes through the
    HOST buffer: device_put of a committed single-device array to a
    multi-process sharding would ask the runtime for a cross-host device
    transfer (unsupported on the CPU/gloo backend, and unnecessary —
    every process already holds the identical full value, whether from
    `create` or an Orbax restore)."""
    state = jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, state)
    return jax.device_put(state, replicated(mesh))


def make_parallel_train_step(g_cfg: GConfig, ds_cfg: DSConfig,
                             dt_cfg: DTConfig, tc: TrainConfig,
                             mesh: Mesh, donate: bool = True,
                             steps_per_call: int = 1):
    """shard_map'd + jitted (data[, time])-parallel train step.

    f(state, real, y, key) with: state replicated; real/y batch-sharded
    over `data`; key replicated — each replica folds in its `data`-axis
    index so z draws and frame samplings are independent per shard (the
    per-step RNG contract extends with the axis index; metrics are pmean'd
    so every host sees the global value).

    If the mesh has a `time` axis of size > 1 (SURVEY §5.7 long-clip CP):
    G and DS replicate along it (same data shard, same folded key →
    identical compute), while DT runs time-sharded with ppermute halos
    (train/step.py dt_score); gradients pmean over BOTH axes, which is
    exactly the unsharded gradient (see step.py docstring for the psum-
    transpose argument).
    """
    n_time = dict(zip(mesh.axis_names, mesh.devices.shape)).get(TIME_AXIS, 1)
    time_axis = TIME_AXIS if n_time > 1 else None
    clip_len = g_cfg.n_frames + g_cfg.cond_frames   # DT sees the full clip
    if time_axis is not None and clip_len % n_time:
        raise ValueError(
            f"clip length {clip_len} not divisible by the time axis "
            f"({n_time} shards)")
    inner = functools.partial(
        train_step_mod.train_step, g_cfg=g_cfg, ds_cfg=ds_cfg, dt_cfg=dt_cfg,
        tc=tc, axis_name=DATA_AXIS, time_axis=time_axis)
    metric_axes = ((DATA_AXIS, TIME_AXIS) if time_axis is not None
                   else DATA_AXIS)

    def per_shard(state, real, y, key):
        # fold over `data` ONLY: time ranks must draw identical streams so
        # the replicated G forward (and its sliced DT input) agree bitwise
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        state, metrics = inner(state, real, y, key)
        metrics = jax.lax.pmean(metrics, metric_axes)
        return state, metrics

    mapped = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    if steps_per_call > 1:
        # chunked stepping (train/step.py scan_steps): scan the shard_map'd
        # step inside one jit; data args gain a leading steps_per_call axis
        # (sharded P(None, data) — see shard_batch_chunk)
        return train_step_mod.scan_steps(mapped, steps_per_call,
                                         donate=donate)
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())
