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
    if max_to_keep is not None and max_to_keep > 0:
        _prune(ckpt_dir, max_to_keep)


def _prune(ckpt_dir: str, max_to_keep: int) -> None:
    import shutil
    base = os.path.abspath(ckpt_dir)
    steps = sorted(int(d) for d in os.listdir(base) if d.isdigit()
                   and os.path.isdir(os.path.join(base, d)))
    for s in steps[:-max_to_keep]:
        shutil.rmtree(os.path.join(base, str(s)), ignore_errors=True)


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
