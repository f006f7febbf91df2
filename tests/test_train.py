"""Training-step tests (SURVEY.md §4): one-step finite-loss/param-change,
determinism at matched seeds, EMA warmup semantics, SN update contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.train import TrainConfig, create, make_train_step

G_CFG = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                emb_dim=16, attn_res=16)
DS_CFG = DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2)
DT_CFG = DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5)
TC = TrainConfig(d_steps=1, batch_size=2, ema_start=0)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    st = create(key, G_CFG, DS_CFG, DT_CFG, TC)
    real = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    y = jnp.array([0, 3])
    step = make_train_step(G_CFG, DS_CFG, DT_CFG, TC, donate=False)
    return st, real, y, step


def _l(tree):
    return jax.tree.leaves(tree)


def test_one_step_finite_and_params_change(setup):
    st, real, y, step = setup
    st2, m = step(st, real, y, jax.random.PRNGKey(2))
    for v in m.values():
        assert np.isfinite(float(v))
    assert int(st2["step"]) == 1
    for name in ("g", "ds", "dt"):
        before = _l(st[name]["params"])
        after = _l(st2[name]["params"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after)), name


def test_determinism_same_seed(setup):
    st, real, y, step = setup
    a, ma = step(st, real, y, jax.random.PRNGKey(7))
    b, mb = step(st, real, y, jax.random.PRNGKey(7))
    for la, lb in zip(_l(a), _l(b)):
        assert np.array_equal(np.asarray(la), np.asarray(lb))
    c, _ = step(st, real, y, jax.random.PRNGKey(8))
    assert any(not np.array_equal(np.asarray(x), np.asarray(z))
               for x, z in zip(_l(a["g"]["params"]), _l(c["g"]["params"])))


def test_sn_u_advances_once_per_owner_step(setup):
    st, real, y, step = setup
    st2, _ = step(st, real, y, jax.random.PRNGKey(3))
    for name in ("g", "ds", "dt"):
        before = st[name]["sn_u"]
        after = st2[name]["sn_u"]
        changed = [p for p in before
                   if not np.allclose(np.asarray(before[p]),
                                      np.asarray(after[p]), atol=1e-7)]
        assert changed, f"{name} sn_u never advanced"


def test_ema_tracks_params_during_warmup(setup):
    """ema_start=0 in TC means decay kicks in at step>=0; use a fresh state
    with a large ema_start to check copy-through."""
    tc = TrainConfig(d_steps=1, batch_size=2, ema_start=1000)
    st = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, tc)
    step = make_train_step(G_CFG, DS_CFG, DT_CFG, tc, donate=False)
    real = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    st2, _ = step(st, real, jnp.array([0, 3]), jax.random.PRNGKey(2))
    # during warmup EMA == params exactly
    for e, p in zip(_l(st2["g_ema"]), _l(st2["g"]["params"])):
        assert np.allclose(np.asarray(e), np.asarray(p))


def test_sampling_shapes_and_determinism(setup):
    from dvdgan_tpu.train import sample
    st, real, y, step = setup
    st2, _ = step(st, real, y, jax.random.PRNGKey(4))
    z = jax.random.normal(jax.random.PRNGKey(5), (2, G_CFG.z_dim))
    v1 = sample(st2["g_ema"], st2["g"]["stats"], st2["g"]["sn_u"], z, y, G_CFG)
    v2 = sample(st2["g_ema"], st2["g"]["stats"], st2["g"]["sn_u"], z, y, G_CFG)
    assert v1.shape == (2, 4, 32, 32, 3)
    assert np.array_equal(np.asarray(v1), np.asarray(v2))


@pytest.mark.slow
def test_grad_accum_d_phase_exact_and_g_runs():
    """tc.grad_accum=k (train/step.py docstring): RNG streams are full-batch
    draws sliced per micro, and fake generation stays one full-batch
    forward — so the D-phase optimizer updates must EXACTLY equal the k=1
    step's (up to mean reassociation). The G phase recomputes per micro
    with per-micro BN stats (documented deviation) — checked loose."""
    import dataclasses

    tc1 = TrainConfig(d_steps=2, batch_size=4, ema_start=0)
    tck = dataclasses.replace(tc1, grad_accum=2)
    st0 = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, tc1)
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(4, 4, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 5, 4), jnp.int32)
    key = jax.random.PRNGKey(7)

    s1, m1 = make_train_step(G_CFG, DS_CFG, DT_CFG, tc1, donate=False)(
        st0, real, y, key)
    sk, mk = make_train_step(G_CFG, DS_CFG, DT_CFG, tck, donate=False)(
        st0, real, y, key)

    # D phase: exact (same fakes, same frame indices, mean-of-micro-grads
    # == full-batch grad for mean losses)
    for name in ("ds", "dt"):
        for la, lb in zip(jax.tree.leaves(s1[name]["params"]),
                          jax.tree.leaves(sk[name]["params"])):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=2e-6, rtol=1e-5)
    for k in ("d_loss", "d_loss_s", "d_loss_t"):
        assert abs(float(m1[k]) - float(mk[k])) < 1e-5, k
    # G phase: finite, params moved, same step/EMA contract
    assert np.isfinite(float(mk["g_loss"]))
    assert int(sk["step"]) == 1
    g1 = jax.tree.leaves(s1["g"]["params"])
    gk = jax.tree.leaves(sk["g"]["params"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(st0_l))
               for a, st0_l in zip(gk, jax.tree.leaves(st0["g"]["params"])))
    # and the per-micro-BN deviation stays small at init
    for la, lb in zip(g1, gk):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=5e-4)


@pytest.mark.slow
def test_per_step_fake_gen_mode():
    """fake_gen='per_step' (the reference's per-forward CBN stats) runs and
    matches 'pooled' when d_steps == 1 (single batch: pooling is a no-op,
    so the two modes must be identical)."""
    import dataclasses

    tc1 = TrainConfig(d_steps=1, batch_size=2, ema_start=0)
    tcp = dataclasses.replace(tc1, fake_gen="per_step")
    st0 = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, tc1)
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(2, 4, 32, 32, 3), jnp.float32)
    y = jnp.asarray([0, 3], jnp.int32)
    key = jax.random.PRNGKey(9)
    s1, m1 = make_train_step(G_CFG, DS_CFG, DT_CFG, tc1, donate=False)(
        st0, real, y, key)
    s2, m2 = make_train_step(G_CFG, DS_CFG, DT_CFG, tcp, donate=False)(
        st0, real, y, key)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # d_steps=2: per_step must still run finite (stats differ by design)
    tc2 = TrainConfig(d_steps=2, batch_size=2, ema_start=0,
                      fake_gen="per_step")
    st2 = create(jax.random.PRNGKey(0), G_CFG, DS_CFG, DT_CFG, tc2)
    _, m = make_train_step(G_CFG, DS_CFG, DT_CFG, tc2, donate=False)(
        st2, real, y, key)
    assert all(np.isfinite(float(v)) for v in m.values())


def test_chunked_stepping_mechanics():
    """scan_steps wiring, chaos-free: a stub step records exactly which
    (batch, label, key) each scan iteration consumed. Must equal the
    trainer's per-step contract: step j gets reals[j], ys[j],
    fold_in(base_key, start + j), in order, with metrics stacked."""
    from dvdgan_tpu.train.step import scan_steps

    def stub(st, r, y, k):
        m = {"rsum": r.sum(), "y0": y[0].astype(jnp.float32),
             "k0": jax.random.key_data(k).reshape(-1)[0]}
        return st + 1, m

    K, start = 4, 12
    reals = jnp.arange(K, dtype=jnp.float32).reshape(K, 1) * 10.0
    ys = jnp.arange(K, dtype=jnp.int32).reshape(K, 1) + 100
    base = jax.random.PRNGKey(3)
    out, m = scan_steps(stub, K, donate=False)(
        jnp.int32(0), reals, ys, base, jnp.int32(start))
    assert int(out) == K
    for j in range(K):
        assert float(m["rsum"][j]) == 10.0 * j
        assert int(m["y0"][j]) == 100 + j
        want_key = jax.random.fold_in(base, start + j)
        assert int(m["k0"][j]) == int(
            jax.random.key_data(want_key).reshape(-1)[0])


def test_chunked_stepping_numerics_one_step(setup):
    """One scanned train step vs the plain jitted step: same key, same
    batch. Cross-executable float reassociation bounds the diff (~1e-5 on
    gradients; Adam's sign-like first update can flip near-zero elements
    by +-lr = 1e-4) — anything larger means a real semantic break. Losses
    (pre-update) must agree to float noise. Multi-step trajectories
    diverge chaotically through Adam and are covered by the mechanics
    test above + the trainer-level chunk test."""
    from dvdgan_tpu.train.step import scan_steps, train_step
    import functools

    st, real, y, step = setup
    base = jax.random.PRNGKey(0)
    ref, m_ref = step(st, real, y, jax.random.fold_in(base, 0))

    raw = functools.partial(train_step, g_cfg=G_CFG, ds_cfg=DS_CFG,
                            dt_cfg=DT_CFG, tc=TC)
    multi = scan_steps(raw, 1, donate=False)
    out, mstack = multi(st, real[None], y[None], base, jnp.int32(0))

    for k in mstack:
        np.testing.assert_allclose(float(mstack[k][0]), float(m_ref[k]),
                                   rtol=1e-4, atol=1e-5)
    assert int(out["step"]) == 1
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-2, atol=5e-4)


def test_fake_gen_typo_rejected(setup):
    import dataclasses
    st, real, y, _ = setup
    bad = dataclasses.replace(TC, fake_gen="Pooled")
    with pytest.raises(ValueError, match="fake_gen"):
        make_train_step(G_CFG, DS_CFG, DT_CFG, bad, donate=False)(
            st, real, y, jax.random.PRNGKey(0))


def test_grad_norm_metrics_gated(setup):
    """log_grad_norms=True adds finite positive g/d_grad_norm scalars that
    match an oracle recomputation; off (the default) they are absent."""
    import dataclasses

    st, real, y, step = setup
    _, m_off = step(st, real, y, jax.random.PRNGKey(2))
    assert "g_grad_norm" not in m_off and "d_grad_norm" not in m_off

    tc_on = dataclasses.replace(TC, log_grad_norms=True)
    step_on = make_train_step(G_CFG, DS_CFG, DT_CFG, tc_on, donate=False)
    _, m_on = step_on(st, real, y, jax.random.PRNGKey(2))
    for k in ("g_grad_norm", "d_grad_norm"):
        v = float(m_on[k])
        assert np.isfinite(v) and v > 0, k
    # the other metrics are untouched by the telemetry
    for k in m_off:
        assert np.asarray(m_off[k]) == np.asarray(m_on[k]), k


@pytest.mark.slow
def test_time_major_fakes_knob_equivalent(monkeypatch):
    """DVDGAN_TM_FAKES=on (gather/φ-pool the fakes in G's native
    time-major layout, transpose the small results) is the same math as
    the default step — gathers/transposes are permutation-exact, but the
    φ-pool's 4-element reduction order is LAYOUT-DEPENDENT (measured:
    1-ulp loss drift), so this is a reassociation-tolerance comparison
    with the same bounds as the scan-vs-loop one-step test (Adam's
    sign-like first update can flip near-zero params by ±lr). Covers
    synthesis and FP, pooled and per_step fake_gen, d_steps=2."""
    tc = TrainConfig(d_steps=2, batch_size=2, ema_start=0)
    fp_g = GConfig(img_size=32, n_frames=2, ch=8, z_dim=120, n_classes=5,
                   emb_dim=16, attn_res=16, cond_frames=2)
    cases = [
        (G_CFG, DT_CFG, tc, (2, 4, 32, 32, 3)),
        (fp_g, DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5), tc,
         (2, 4, 32, 32, 3)),
        (G_CFG, DT_CFG,
         TrainConfig(d_steps=2, batch_size=2, ema_start=0,
                     fake_gen="per_step"), (2, 4, 32, 32, 3)),
    ]
    for g_cfg, dt_cfg, tcc, shp in cases:
        st = create(jax.random.PRNGKey(0), g_cfg, DS_CFG, dt_cfg, tcc)
        real = jax.random.normal(jax.random.PRNGKey(1), shp)
        y = jnp.array([0, 3])
        outs = {}
        for knob in ("off", "on"):
            monkeypatch.setenv("DVDGAN_TM_FAKES", knob)
            step = make_train_step(g_cfg, DS_CFG, dt_cfg, tcc, donate=False)
            outs[knob] = step(st, real, y, jax.random.PRNGKey(2))
        (st_off, m_off), (st_on, m_on) = outs["off"], outs["on"]
        for k in m_off:
            np.testing.assert_allclose(float(m_on[k]), float(m_off[k]),
                                       rtol=1e-4, atol=1e-5, err_msg=k)
        for lo, ln in zip(jax.tree.leaves(st_off), jax.tree.leaves(st_on)):
            np.testing.assert_allclose(np.asarray(ln, np.float64),
                                       np.asarray(lo, np.float64),
                                       rtol=1e-2, atol=5e-4)
    monkeypatch.delenv("DVDGAN_TM_FAKES")
