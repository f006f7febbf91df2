"""Data-parallel correctness on the 8-virtual-CPU-device mesh (SURVEY §4):
the shard_map'd step must run, produce finite pmean'd metrics, and keep
parameters bit-identical across replicas (grads psum'd ⇒ replicas never
diverge). Cross-replica BN equivalence is covered in test_ops.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.parallel import (make_mesh, make_parallel_train_step,
                                 replicate_state, shard_batch)
from dvdgan_tpu.train import TrainConfig, create

G_CFG = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                emb_dim=16, attn_res=16)
DS_CFG = DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2)
DT_CFG = DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5)
TC = TrainConfig(d_steps=1, batch_size=8)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device")
def test_parallel_step_runs_and_replicas_agree():
    mesh = make_mesh()
    n_dev = jax.device_count()
    st = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, TC)
    st = replicate_state(mesh, st)

    real = np.random.RandomState(0).randn(n_dev, 4, 32, 32, 3).astype(np.float32)
    y = np.arange(n_dev, dtype=np.int32) % 5
    real_d, y_d = shard_batch(mesh, real, y)

    step = make_parallel_train_step(G_CFG, DS_CFG, DT_CFG, TC, mesh,
                                    donate=False)
    st2, m = step(st, real_d, y_d, jax.random.PRNGKey(1))
    for v in m.values():
        assert np.isfinite(float(v))
    assert int(st2["step"]) == 1
    # replicated out-spec: every leaf is fully addressable and identical
    leaf = jax.tree.leaves(st2["g"]["params"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        assert np.array_equal(shards[0], s)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device")
def test_parallel_matches_single_device_when_rng_aligned():
    """With cross-replica BN + pmean'd grads, an N-way sharded batch must
    train exactly like the same global batch on one device — up to the RNG
    fold-in. We check the D losses are close (not bitwise: per-replica z
    draws differ by design)."""
    mesh = make_mesh()
    st = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, TC)
    strep = replicate_state(mesh, st)
    n_dev = jax.device_count()
    real = np.random.RandomState(1).randn(n_dev, 4, 32, 32, 3).astype(np.float32)
    y = (np.arange(n_dev) % 5).astype(np.int32)
    real_d, y_d = shard_batch(mesh, real, y)
    pstep = make_parallel_train_step(G_CFG, DS_CFG, DT_CFG, TC, mesh,
                                     donate=False)
    _, pm = pstep(strep, real_d, y_d, jax.random.PRNGKey(2))

    from dvdgan_tpu.train import make_train_step
    sstep = make_train_step(G_CFG, DS_CFG, DT_CFG, TC, donate=False)
    _, sm = sstep(st, jnp.asarray(real), jnp.asarray(y), jax.random.PRNGKey(2))
    # same real data, same initial params: real-side hinge terms line up
    # closely even though fake batches differ per replica.
    assert np.isfinite(float(pm["d_loss"]))
    assert abs(float(pm["d_loss"]) - float(sm["d_loss"])) < 10.0
