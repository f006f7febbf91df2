"""Checkpoint / resume (SURVEY.md §2.14, §3.5, §5.4).

Reference behavior: torch.save of {G, DS, DT, optims, step} state-dicts
keyed by step; `--pretrained_model <step>` resumes. Here the checkpoint IS
the train-state pytree, saved with Orbax — which already includes what the
reference forgets (SURVEY §3.5 note): optimizer states, EMA params, SN `u`
vectors and BN running stats, so restore is bitwise
and sampling continuity at matched seeds holds across preemption (the PRNG
key is derived from seed+step, so storing `step` pins the stream).

`latest_step` + `restore_latest` give auto-resume-from-latest at startup
(SURVEY §5.3: the preemption-safety upgrade over the reference's manual
resume flag).
"""

from __future__ import annotations

import os
import threading
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def save(ckpt_dir: str, step: int, state: Any,
         max_to_keep: Optional[int] = None) -> None:
    """Write `state` under ckpt_dir/<step>/ (atomic via Orbax tmp+rename).
    `max_to_keep`: after a successful save, delete the oldest checkpoints
    beyond the newest N (long runs would otherwise fill the disk; the
    reference keeps everything)."""
    path = os.path.join(os.path.abspath(ckpt_dir), str(step))
    with _checkpointer() as ckptr:
        ckptr.save(path, state, force=True)
    # multihost: every process calls save (Orbax coordinates the write),
    # but only the leader prunes — N processes rmtree-ing a shared
    # ckpt_dir would race
    if (max_to_keep is not None and max_to_keep > 0
            and jax.process_index() == 0):
        _prune(ckpt_dir, max_to_keep)


def _prune(ckpt_dir: str, max_to_keep: int) -> None:
    import shutil
    base = os.path.abspath(ckpt_dir)
    steps = sorted(int(d) for d in os.listdir(base) if d.isdigit()
                   and os.path.isdir(os.path.join(base, d)))
    for s in steps[:-max_to_keep]:
        shutil.rmtree(os.path.join(base, str(s)), ignore_errors=True)


class AsyncSaver:
    """Checkpointing off the training path (SURVEY §5.4).

    `save()` snapshots the state to host memory on the caller's thread —
    mandatory, because the train step donates its state argument
    (`make_train_step(donate=True)`), so the device buffers die at the
    next dispatch — then runs the Orbax write + retention prune on a
    background thread. The snapshot itself is overlapped: every leaf's
    device→host DMA is started at once with `copy_to_host_async` before
    the blocking `device_get` walk (a cold leaf-by-leaf fetch would pay
    one remote-tunnel round-trip per leaf).

    At most one write is in flight: a second `save()` (or `wait()`) joins
    the previous one first and re-raises any failure it hit — a silently
    dropped checkpoint would void the preemption-safety contract that
    `latest_step` resume relies on.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, ckpt_dir: str, step: int, state: Any,
             max_to_keep: Optional[int] = None) -> None:
        self.wait()
        for leaf in jax.tree.leaves(state):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        host_state = jax.device_get(state)

        def _write():
            try:
                save(ckpt_dir, step, host_state, max_to_keep=max_to_keep)
            except BaseException as e:   # re-raised on the caller's thread
                self._error = e

        self._thread = threading.Thread(
            target=_write, name=f"ckpt-save-{step}", daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) finishes; re-raise its
        failure. Call after the train loop so the final checkpoint is
        durable before the process exits. The thread slot is cleared only
        AFTER a successful join — a KeyboardInterrupt mid-join leaves the
        write tracked, so a retrying caller still awaits it instead of
        racing a second write against the orphan."""
        t = self._thread
        if t is not None:
            t.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()
             and os.path.isdir(os.path.join(ckpt_dir, d))]
    return max(steps) if steps else None


def restore(ckpt_dir: str, step: int, template: Any) -> Any:
    """Restore the state saved at `step`. `template` is a concrete or
    abstract state pytree (e.g. a freshly `create`d one) fixing structure,
    shapes, dtypes and shardings."""
    path = os.path.join(os.path.abspath(ckpt_dir), str(step))
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    with _checkpointer() as ckptr:
        return ckptr.restore(path, abstract)


def restore_latest(ckpt_dir: str, template: Any) -> tuple[Optional[int], Any]:
    """(step, state) for the newest checkpoint, or (None, template)."""
    step = latest_step(ckpt_dir)
    if step is None:
        return None, template
    return step, restore(ckpt_dir, step, template)
