"""Pallas kernel tests (interpret mode on CPU — SURVEY §7.7 'measure vs
XLA-fused baseline' happens on the TPU; numerics are validated here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdgan_tpu.kernels import convgru_cell as kc
from dvdgan_tpu.ops import convgru


def _rand_cell_inputs(key, b=2, h=6, w=6, c=8, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    gx = jax.random.normal(ks[0], (b, h, w, 2 * c), dtype)
    cx = jax.random.normal(ks[1], (b, h, w, c), dtype)
    hh = jax.random.normal(ks[2], (b, h, w, c), dtype)
    wg = jax.random.normal(ks[3], (3, 3, c, 2 * c), dtype) * 0.1
    wc = jax.random.normal(ks[4], (3, 3, c, c), dtype) * 0.1
    return gx, cx, hh, wg, wc


def test_fused_cell_matches_reference_f32():
    args = _rand_cell_inputs(jax.random.PRNGKey(0))
    out_k = kc.gru_cell_fused(*args, True)
    out_r = kc._cell_reference(*args)
    assert np.allclose(np.asarray(out_k), np.asarray(out_r), atol=1e-5)


def test_fused_cell_matches_reference_bf16():
    args = _rand_cell_inputs(jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    out_k = kc.gru_cell_fused(*args, True)
    out_r = kc._cell_reference(*args)
    # both paths accumulate f32 and round once to bf16 on output
    assert np.allclose(np.asarray(out_k, np.float32),
                       np.asarray(out_r, np.float32), atol=2e-2)


def test_fused_cell_gradients_match_reference():
    args = _rand_cell_inputs(jax.random.PRNGKey(2), b=1, h=4, w=4, c=4)

    def loss_k(gx, cx, h, wg, wc):
        return (kc.gru_cell_fused(gx, cx, h, wg, wc, True)
                .astype(jnp.float32) ** 2).mean()

    def loss_r(gx, cx, h, wg, wc):
        return (kc._cell_reference(gx, cx, h, wg, wc)
                .astype(jnp.float32) ** 2).mean()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gk, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cell_kernel_scan_matches_xla_path_interpret():
    """Scanning the single-step cell kernel (interpret mode) equals the XLA
    path in f32 (the sequence kernel path is covered further below)."""
    c = 8
    p = convgru.convgru_init(jax.random.PRNGKey(3), c)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 6, 6, c))
    y_xla = convgru.convgru(p, x, use_pallas=False)

    from dvdgan_tpu.ops import layers as L
    wg = p["gates_h"]["w"]
    wc = p["cand_h"]["w"]
    xf = x.reshape(10, 6, 6, c)
    gx = L.conv2d(p["gates_x"], xf).reshape(2, 5, 6, 6, 2 * c)
    cx = L.conv2d(p["cand_x"], xf).reshape(2, 5, 6, 6, c)

    def step(hid, inp):
        g, cxt = inp
        hid = kc.gru_cell_fused(g, cxt, hid, wg, wc, True)
        return hid, hid

    h0 = jnp.zeros((2, 6, 6, c))
    _, hs = jax.lax.scan(step, h0, (jnp.moveaxis(gx, 1, 0),
                                    jnp.moveaxis(cx, 1, 0)))
    y_pl = jnp.moveaxis(hs, 0, 1)
    assert np.allclose(np.asarray(y_xla), np.asarray(y_pl), atol=1e-5)


def test_fits_vmem_gate():
    assert kc.fits_vmem(8, 32, 32, 64)      # generator level sizes fit
    assert not kc.fits_vmem(8, 128, 128, 256)  # way over budget


# -------------------------------------------------- spatial attention -------

from dvdgan_tpu.kernels import attention_spatial as ka


def _rand_attn_inputs(key, n=3, h=8, w=8, c=16, dtype=jnp.float32,
                      gamma=0.7):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (n, h, w, c), dtype)
    wq = jax.random.normal(ks[1], (c, c // 8), dtype) * 0.3
    wk = jax.random.normal(ks[2], (c, c // 8), dtype) * 0.3
    wv = jax.random.normal(ks[3], (c, c // 2), dtype) * 0.3
    wo = jax.random.normal(ks[4], (c // 2, c), dtype) * 0.3
    return x, wq, wk, wv, wo, jnp.asarray(gamma, jnp.float32)


def test_fused_attn_matches_reference_f32():
    args = _rand_attn_inputs(jax.random.PRNGKey(0))
    out_k = ka.spatial_attn_fused(*args, True)
    out_r = ka._spatial_attn_reference(*args)
    assert np.allclose(np.asarray(out_k), np.asarray(out_r), atol=1e-4)


def test_fused_attn_identity_at_gamma_zero():
    args = _rand_attn_inputs(jax.random.PRNGKey(1), gamma=0.0)
    out_k = ka.spatial_attn_fused(*args, True)
    assert np.allclose(np.asarray(out_k), np.asarray(args[0]), atol=1e-6)


def test_fused_attn_gradients_match_reference():
    args = _rand_attn_inputs(jax.random.PRNGKey(2), n=1, h=4, w=4, c=8)

    def loss_k(*a):
        return (ka.spatial_attn_fused(*a, True).astype(jnp.float32) ** 2).mean()

    def loss_r(*a):
        return (ka._spatial_attn_reference(*a).astype(jnp.float32) ** 2).mean()

    gk = jax.grad(loss_k, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(6)))(*args)
    for a, b in zip(gk, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_separable_attn_pallas_path_matches_xla():
    import unittest.mock as mock
    from dvdgan_tpu.ops import attention
    p = attention.separable_attn_init(jax.random.PRNGKey(3), 16)
    # nonzero gammas so both passes actually contribute
    p["spatial"]["gamma"] = jnp.asarray(0.5, jnp.float32)
    p["temporal"]["gamma"] = jnp.asarray(0.3, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 8, 8, 16))
    y_xla = attention.separable_attn(p, x, use_pallas=False)

    real = ka.spatial_attn_fused

    def interp(x, wq, wk, wv, wo, gamma, interpret=False):
        return real(x, wq, wk, wv, wo, gamma, True)

    with mock.patch.object(attention.kernels, "spatial_attn_fused", interp):
        y_pl = attention.separable_attn(p, x, use_pallas=True)
    assert np.allclose(np.asarray(y_xla), np.asarray(y_pl), atol=1e-4)


# ------------------------------------------------- whole-sequence GRU -------

from dvdgan_tpu.kernels import convgru_seq as kseq


def _rand_seq_inputs(key, t=4, b=2, h=6, w=6, c=8, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    gx = jax.random.normal(ks[0], (t, b, h, w, 2 * c), dtype)
    cx = jax.random.normal(ks[1], (t, b, h, w, c), dtype)
    h0 = jax.random.normal(ks[2], (b, h, w, c), dtype)
    wg = jax.random.normal(ks[3], (3, 3, c, 2 * c), dtype) * 0.1
    wc = jax.random.normal(ks[4], (3, 3, c, c), dtype) * 0.1
    return gx, cx, h0, wg, wc


def test_seq_kernel_matches_reference_f32():
    args = _rand_seq_inputs(jax.random.PRNGKey(0))
    hs = kseq.gru_sequence_fused(*args, True)
    ref = kseq._seq_reference(*args)
    assert hs.shape == ref.shape
    assert np.allclose(np.asarray(hs), np.asarray(ref), atol=1e-5)


def test_seq_kernel_gradients_close_to_reference():
    """The backward recomputes gates in the activation dtype from the saved
    hidden sequence; in f32 that equals exact BPTT through the scan."""
    args = _rand_seq_inputs(jax.random.PRNGKey(1), t=3, b=1, h=4, w=4, c=4)

    def loss_k(*a):
        return (kseq.gru_sequence_fused(*a, True)
                .astype(jnp.float32) ** 2).mean()

    def loss_r(*a):
        return (kseq._seq_reference(*a).astype(jnp.float32) ** 2).mean()

    gk = jax.grad(loss_k, argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(5)))(*args)
    for a, b in zip(gk, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_convgru_seq_path_matches_xla_scan_interpret():
    import unittest.mock as mock
    c = 8
    p = convgru.convgru_init(jax.random.PRNGKey(3), c)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 6, 6, c))
    y_xla = convgru.convgru(p, x, use_pallas=False)

    real = kseq.gru_sequence_fused

    def interp(gx, cx, h0, wg, wc, interpret=False):
        return real(gx, cx, h0, wg, wc, True)

    with mock.patch.object(convgru.kernels, "gru_sequence_fused", interp):
        y_pl = convgru.convgru(p, x, use_pallas=True)
    assert np.allclose(np.asarray(y_xla), np.asarray(y_pl), atol=1e-5)


# ---------------------------------------------- reverse-time BPTT kernel ----

from dvdgan_tpu.kernels import convgru_bwd as kbwd


def test_bwd_kernel_matches_autodiff():
    """gru_sequence_bwd (interpret) == jax.vjp of the sequence oracle."""
    args = _rand_seq_inputs(jax.random.PRNGKey(5), t=3, b=2, h=6, w=6, c=8)
    gx, cx, h0, wg, wc = args
    hs = kseq._seq_reference(*args)
    g = jax.random.normal(jax.random.PRNGKey(6), hs.shape)

    _, vjp = jax.vjp(kseq._seq_reference, *args)
    want = vjp(g)
    got = kbwd.gru_sequence_bwd(gx, cx, h0, wg, wc, hs, g, interpret=True)
    for a, b in zip(got, want):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("mode", ["on", "off"])
def test_rowpack_taps_match_reference(monkeypatch, mode):
    """Both DVDGAN_GRU_ROWPACK values (on = 3 K=3C row-packed tap matmuls,
    the measured default; off = 9 K=C taps) compute the same sequence
    forward AND Pallas backward as the oracle — the MXU-depth lowering
    only reassociates the tap sum. Also rejects typos (trace-time knob)."""
    monkeypatch.setenv("DVDGAN_GRU_ROWPACK", mode)
    args = _rand_seq_inputs(jax.random.PRNGKey(31), t=3, b=2, h=6, w=6, c=8)
    hs = kseq.gru_sequence_fused(*args, True)
    ref = kseq._seq_reference(*args)
    assert np.allclose(np.asarray(hs), np.asarray(ref), atol=1e-5)

    gx, cx, h0, wg, wc = args
    g = jax.random.normal(jax.random.PRNGKey(32), ref.shape)
    _, vjp = jax.vjp(kseq._seq_reference, *args)
    want = vjp(g)
    got = kbwd.gru_sequence_bwd(gx, cx, h0, wg, wc, ref, g, interpret=True)
    for a, b in zip(got, want):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    monkeypatch.setenv("DVDGAN_GRU_ROWPACK", "bogus")
    with pytest.raises(ValueError):
        kc._rowpack()


def test_bwd_scan_matches_autodiff():
    """_seq_bwd_scan (the default backward) == jax.vjp of the oracle."""
    args = _rand_seq_inputs(jax.random.PRNGKey(7), t=4, b=1, h=4, w=4, c=4)
    hs = kseq._seq_reference(*args)
    g = jax.random.normal(jax.random.PRNGKey(8), hs.shape)
    _, vjp = jax.vjp(kseq._seq_reference, *args)
    want = vjp(g)
    got = kseq._seq_bwd_scan(*args, hs, g)
    for a, b in zip(got, want):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_bwd_vmem_gate_is_bwd_specific():
    """The backward's working set is ~3× the forward's: shapes the forward
    accepts must still be REJECTED by the backward gate when its own
    estimate overflows, and the measured-good T=48 bench shape must pass
    (ADVICE r1 medium: no more borrowing the forward's estimate)."""
    assert kbwd.fits_vmem(8, 32, 32, 64, 2)       # measured-good on-chip
    assert kc.fits_vmem(8, 32, 32, 64, 4)         # fwd fits this f32 shape...
    assert not kbwd.fits_vmem(8, 32, 32, 64, 4)   # ...bwd must not


def test_bwd_vmem_budget_env_override(monkeypatch):
    """DVDGAN_GRU_BWD_MB moves the admission boundary per trace (the
    ab_inprocess calibration knob); bogus values fail loudly."""
    import pytest

    assert kbwd.fits_vmem(8, 32, 32, 64, 2)           # 8.33 MB < 9 default
    monkeypatch.setenv("DVDGAN_GRU_BWD_MB", "8")
    assert not kbwd.fits_vmem(8, 32, 32, 64, 2)
    monkeypatch.setenv("DVDGAN_GRU_BWD_MB", "8.5")
    assert kbwd.fits_vmem(8, 32, 32, 64, 2)
    monkeypatch.setenv("DVDGAN_GRU_BWD_MB", "lots")
    with pytest.raises(ValueError, match="DVDGAN_GRU_BWD_MB"):
        kbwd.fits_vmem(8, 32, 32, 64, 2)


def test_bwd_selection_falls_back_when_unfit(monkeypatch):
    """_bwd with the kernel forced ON still takes the scan path when the
    bwd-specific VMEM gate rejects the shape (instead of a Mosaic OOM)."""
    called = {}
    real_scan = kseq._seq_bwd_scan

    def spy(*a):
        called["scan"] = True
        return real_scan(*a)

    monkeypatch.setattr(kseq, "_seq_bwd_scan", spy)
    monkeypatch.setattr(kseq, "PALLAS_BWD", True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(kbwd, "fits_vmem", lambda *a: False)
    args = _rand_seq_inputs(jax.random.PRNGKey(9), t=3, b=1, h=4, w=4, c=4)
    hs = kseq._seq_reference(*args)
    g = jnp.ones_like(hs)
    kseq._bwd(False, (*args, hs), g)
    assert called.get("scan")


def _seq_ws(bb, h, w, c, itemsize):
    """Mirror of _seq_batch_block's per-block working-set formula."""
    gates = 3 * bb * h * w * 2 * c * 4
    pads = 2 * bb * (h + 2) * (w + 2) * c * itemsize
    carry = bb * h * w * c * itemsize
    io = 9 * bb * h * w * c * itemsize
    rowpack = 3 * bb * h * w * c * itemsize if kc._rowpack() else 0
    return gates + pads + carry + io + rowpack


def test_seq_kernel_multi_batch_block_grid(monkeypatch):
    """Force grid=(2, T) — a batch-block SMALLER than the batch — and check
    the carry-reset predicate at t==0 of the second batch block. Production
    shapes exercise this path but every default-budget test ran at
    grid=(1, T) (review finding)."""
    args = _rand_seq_inputs(jax.random.PRNGKey(9), t=3, b=2, h=4, w=4, c=8)
    itemsize = args[2].dtype.itemsize
    monkeypatch.setattr(kc, "_VMEM_LIMIT_BYTES",
                        _seq_ws(1, 4, 4, 8, itemsize) + 1)
    assert kseq._seq_batch_block(2, 4, 4, 8, itemsize) == 1
    hs = kseq.gru_sequence_fused(*args, True)
    ref = kseq._seq_reference(*args)
    assert np.allclose(np.asarray(hs), np.asarray(ref), atol=1e-5)


def test_seq_kernel_refuses_unfit_shape(monkeypatch):
    """When even a single sample overflows the budget, _seq_pallas raises
    (the caller gates with convgru_seq.fits_vmem) instead of compiling an
    over-budget kernel that would OOM Mosaic opaquely."""
    import pytest

    args = _rand_seq_inputs(jax.random.PRNGKey(10), t=2, b=2, h=4, w=4, c=8)
    monkeypatch.setattr(kc, "_VMEM_LIMIT_BYTES", 1)
    assert not kseq.fits_vmem(2, 4, 4, 8, 4)
    with pytest.raises(ValueError, match="does not fit"):
        kseq.gru_sequence_fused(*args, True)


def _bwd_ws(bb, h, w, c, itemsize):
    """Mirror of _bwd_batch_block's per-block working-set formula."""
    n = bb * h * w
    f32 = 4 * n * (4 * 2 * c + 14 * c)
    pads = 5 * bb * (h + 2) * (w + 2) * c * itemsize
    carry = n * c * itemsize
    io = 10 * n * c * itemsize
    # widest rowpacked input: the transposed conv over the 2C-wide pad2c
    rowpack = 3 * n * 2 * c * itemsize if kc._rowpack() else 0
    return f32 + pads + carry + io + rowpack


def test_bwd_kernel_multi_batch_block_grid(monkeypatch):
    """Same for the reverse-time BPTT kernel: grid=(2, T) with the dh carry
    reset at j==0 per batch block, and the dh0 last-write-wins output."""
    args = _rand_seq_inputs(jax.random.PRNGKey(11), t=3, b=2, h=4, w=4, c=8)
    gx, cx, h0, wg, wc = args
    hs = kseq._seq_reference(*args)
    g = jax.random.normal(jax.random.PRNGKey(12), hs.shape)
    itemsize = h0.dtype.itemsize
    monkeypatch.setattr(kbwd, "_BWD_VMEM_LIMIT_BYTES",
                        _bwd_ws(1, 4, 4, 8, itemsize) + 1)
    assert kbwd._bwd_batch_block(2, 4, 4, 8, itemsize) == 1
    _, vjp = jax.vjp(kseq._seq_reference, *args)
    want = vjp(g)
    got = kbwd.gru_sequence_bwd(gx, cx, h0, wg, wc, hs, g, interpret=True)
    for a, b in zip(got, want):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_attention_kernel_vmem_gate():
    """The spatial-attention kernel holds the full f32 logits+attn per
    frame: the 32×32 production map fits, 64×64 can never (32 MB of logits
    alone) — the ops/attention auto-path gates on this (review finding)."""
    from dvdgan_tpu.kernels import attention_spatial as ka

    assert ka.fits_vmem(32, 32, 64, 2)
    assert not ka.fits_vmem(64, 64, 64, 2)
    assert not ka.fits_vmem(128, 128, 64, 2)


def test_attention_kernel_refuses_unfit_shape():
    """use_pallas=True overrides the auto-gate, so the kernel itself must
    fail loudly on an over-budget frame (like convgru_seq) instead of
    compiling into an opaque Mosaic OOM."""
    import pytest

    from dvdgan_tpu.kernels import attention_spatial as ka

    c = 64
    x = jnp.zeros((1, 64, 64, c), jnp.bfloat16)
    wq = jnp.zeros((c, c // 8), jnp.float32)
    wk = jnp.zeros((c, c // 8), jnp.float32)
    wv = jnp.zeros((c, c // 2), jnp.float32)
    wo = jnp.zeros((c // 2, c), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        ka._spatial_attn_pallas(x, wq, wk, wv, wo, jnp.float32(0.1))


# ------------------------------------------------- scan-path custom VJP ----

def test_gru_sequence_scan_forward_bitwise():
    """gru_sequence_scan's forward is BITWISE the plain scan of
    _cell_from_hoisted that ops/convgru.py's fallback used to inline —
    swapping the VJP must not move a single forward bit (resume streams,
    sampling determinism)."""
    for dtype in (jnp.float32, jnp.bfloat16):
        gx, cx, h0, wg, wc = _rand_seq_inputs(
            jax.random.PRNGKey(3), dtype=dtype)
        p = {"gates_h": {"w": wg}, "cand_h": {"w": wc}}

        def old_scan(gx, cx, h0):
            def step(h, inputs):
                h = convgru._cell_from_hoisted(p, inputs[0], inputs[1], h)
                return h, h
            return jax.lax.scan(step, h0, (gx, cx), unroll=2)[1]

        want = jax.jit(old_scan)(gx, cx, h0)
        got = jax.jit(
            lambda gx, cx, h0: kseq.gru_sequence_scan(gx, cx, h0, wg, wc, 2)
        )(gx, cx, h0)
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gru_sequence_scan_grads_match_autodiff():
    """The saved-hs backward == plain autodiff through the forward scan at
    f32 (recompute in f32 is the same math autodiff differentiates; only
    residual storage changes)."""
    args = _rand_seq_inputs(jax.random.PRNGKey(4))
    g = jax.random.normal(jax.random.PRNGKey(5),
                          (4, 2, 6, 6, 8), jnp.float32)

    def loss_custom(*a):
        return jnp.vdot(kseq.gru_sequence_scan(*a, 2), g)

    def loss_auto(*a):
        return jnp.vdot(kseq._seq_scan_impl(*a, 2), g)

    got = jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4))(*args)
    want = jax.grad(loss_auto, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(got, want):
        assert np.allclose(np.asarray(a), np.asarray(b),
                           rtol=1e-5, atol=1e-5)


def test_convgru_fallback_routes_through_scan_vjp(monkeypatch):
    """ops/convgru.py's non-Pallas path calls gru_sequence_scan (the
    saved-hs VJP), not plain autodiff-through-scan."""
    called = {}
    real = kseq.gru_sequence_scan

    def spy(*a, **k):
        called["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(kseq, "gru_sequence_scan", spy)
    p = convgru.convgru_init(jax.random.PRNGKey(6), 4)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 6, 6, 4))
    y = convgru.convgru(p, x, use_pallas=False)
    assert called.get("hit") and y.shape == x.shape


# ------------------------------------------- spatially-blocked GRU kernel ---

from dvdgan_tpu.kernels import convgru_blocked as kblk


@pytest.mark.parametrize("plan_", [(1, 2), (2, 3), (1, 3)])
def test_blocked_kernel_matches_reference(plan_):
    """H-blocked grid == the sequence oracle across plans exercising
    multiple batch blocks (carry re-seed), multiple H-blocks (interior
    halos from the persistent planes) and edge blocks (zero SAME-pad)."""
    args = _rand_seq_inputs(jax.random.PRNGKey(40), t=3, b=2, h=6, w=6, c=8)
    hs = kblk.gru_sequence_blocked(*args, True, plan_)
    ref = kseq._seq_reference(*args)
    assert hs.shape == ref.shape
    assert np.allclose(np.asarray(hs), np.asarray(ref), atol=1e-5)


def test_blocked_kernel_bf16_matches_reference():
    args = _rand_seq_inputs(jax.random.PRNGKey(46), t=3, b=2, h=6, w=6,
                            c=8, dtype=jnp.bfloat16)
    hs = kblk.gru_sequence_blocked(*args, True, (1, 3))
    ref = kseq._seq_reference(*args)
    assert hs.dtype == jnp.bfloat16
    assert np.allclose(np.asarray(hs, np.float32),
                       np.asarray(ref, np.float32), atol=3e-2)


def test_blocked_kernel_gradients_close_to_reference():
    """The custom VJP (shared saved-hs reverse scan) == exact BPTT through
    the oracle at f32."""
    args = _rand_seq_inputs(jax.random.PRNGKey(44), t=3, b=1, h=4, w=4, c=4)

    def loss_k(*a):
        return (kblk.gru_sequence_blocked(*a, True, (1, 2))
                .astype(jnp.float32) ** 2).mean()

    def loss_r(*a):
        return (kseq._seq_reference(*a).astype(jnp.float32) ** 2).mean()

    gk = jax.grad(loss_k, argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(5)))(*args)
    for a, b in zip(gk, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_blocked_planner_and_gates(monkeypatch):
    """The 128px 64×64×64 level (batch 8, bf16) — the exact shape the
    whole-plane kernel rejects — gets a valid blocked plan with ≥2
    H-blocks; an impossible budget yields None and a loud refusal."""
    assert not kseq.fits_vmem(8, 64, 64, 64, 2)
    p = kblk.plan(8, 64, 64, 64, 2)
    assert p is not None
    bb, hbs = p
    assert 8 % bb == 0 and 64 % hbs == 0 and hbs < 64

    monkeypatch.setattr(kblk, "_BLOCKED_VMEM_LIMIT_BYTES", 1)
    assert kblk.plan(2, 4, 4, 8, 4) is None
    assert not kblk.fits(2, 4, 4, 8, 4)
    args = _rand_seq_inputs(jax.random.PRNGKey(43), t=2, b=2, h=4, w=4, c=8)
    with pytest.raises(ValueError, match="does not fit"):
        kblk.gru_sequence_blocked(*args, True)


def test_convgru_routes_blocked_when_seq_unfit(monkeypatch):
    """ops/convgru.py's auto path: when the whole-plane kernel's VMEM gate
    rejects but the blocked planner fits AND DVDGAN_GRU_BLOCKED=auto, the
    blocked kernel is selected (bf16, non-CPU backend) — and the result
    matches the scan fallback."""
    c = 8
    p = convgru.convgru_init(jax.random.PRNGKey(41), c)
    x = jax.random.normal(
        jax.random.PRNGKey(42), (2, 3, 6, 6, c)).astype(jnp.bfloat16)
    want = convgru.convgru(p, x, use_pallas=False)

    monkeypatch.setenv("DVDGAN_GRU_BLOCKED", "on")   # force at tiny T
    monkeypatch.setattr(convgru.kernels.convgru_seq, "fits_vmem",
                        lambda *a, **k: False)
    called = {}

    def fake_blocked(gx, cx, h0, wg, wc, interpret=False, force_plan=None):
        called["hit"] = True
        return kblk.gru_sequence_blocked(gx, cx, h0, wg, wc, True, (1, 3))

    monkeypatch.setattr(convgru.kernels, "gru_sequence_blocked",
                        fake_blocked)
    monkeypatch.setattr(convgru.jax, "default_backend", lambda: "tpu")
    got = convgru.convgru(p, x)
    assert called.get("hit")
    assert np.allclose(np.asarray(got, np.float32),
                       np.asarray(want, np.float32), atol=3e-2)

    # default (auto) gates on clip length: T=3 < the long-clip boundary
    # must NOT route through the blocked kernel
    monkeypatch.delenv("DVDGAN_GRU_BLOCKED")
    called.clear()
    convgru.convgru(p, x)
    assert not called
    # ...but a long clip (T >= _PALLAS_BWD_MIN_T) does
    t_long = kseq._PALLAS_BWD_MIN_T
    x_long = jax.random.normal(
        jax.random.PRNGKey(43), (1, t_long, 6, 6, c)).astype(jnp.bfloat16)
    convgru.convgru(p, x_long)
    assert called.get("hit")


# ------------------------------------------------ fused upsample kernel ----

from dvdgan_tpu.kernels import ups2x_fused as kups
from dvdgan_tpu.ops import layers as L


def _ups_inputs(key, n, h, w, cin, cout, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    wall = jax.random.normal(k1, (4 * cin, 4 * cout), dtype) * 0.3
    x = jax.random.normal(k2, (n, h, w, cin), dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return wall, xp


@pytest.mark.parametrize("force_bh", [None, 2, 4])
def test_ups2x_forward_matches_oracle(force_bh):
    """Fused phase-conv+interleave (interpret grid) == the lax oracle,
    across 1-block and multi-block plans (halo rows between blocks)."""
    wall, xp = _ups_inputs(jax.random.PRNGKey(0), 2, 8, 6, 8, 4)
    got = kups.ups2x(wall, xp, True, True, force_bh)
    ref = kups._lax_oracle(wall, xp)
    assert got.shape == ref.shape == (2, 16, 12, 4)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_ups2x_bf16_forward():
    wall, xp = _ups_inputs(jax.random.PRNGKey(1), 1, 6, 6, 8, 8,
                           jnp.bfloat16)
    got = kups.ups2x(wall, xp, True, True, 3)
    ref = kups._lax_oracle(wall, xp)
    assert got.dtype == jnp.bfloat16
    assert np.allclose(np.asarray(got, np.float32),
                       np.asarray(ref, np.float32), atol=3e-2)


@pytest.mark.parametrize("pallas_bwd", [True, False])
def test_ups2x_gradients_match_oracle(pallas_bwd):
    """Both backward modes (fused Pallas dxp/dwall accumulation; lax
    recompute) == jax.vjp of the oracle: multi-block plan so the dxp
    accumulator composes overlapping halo-row contributions."""
    wall, xp = _ups_inputs(jax.random.PRNGKey(2), 2, 6, 4, 4, 8)

    def loss_k(wall, xp):
        return (kups.ups2x(wall, xp, pallas_bwd, True, 2)
                .astype(jnp.float32) ** 2).mean()

    def loss_r(wall, xp):
        return (kups._lax_oracle(wall, xp).astype(jnp.float32) ** 2).mean()

    gk = jax.grad(loss_k, argnums=(0, 1))(wall, xp)
    gr = jax.grad(loss_r, argnums=(0, 1))(wall, xp)
    for a, b in zip(gk, gr):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ups2x_planner_and_budget(monkeypatch):
    """Padded-allocation model (observed on v5e): the 256px top level
    (128×128, 64→32, bf16) fits the forward; its BACKWARD's double-
    buffered f32 whole-frame accumulator exceeds the 16 MB scoped-vmem
    hard limit (measured OOM: 29.41M) so fits_bwd must refuse it — the
    VJP falls back to the lax recompute there. Interior levels keep the
    Pallas backward. An impossible budget refuses loudly."""
    assert kups.fits_fwd(128, 128, 64, 32, 2)
    assert not kups.fits_bwd(128, 128, 64, 32, 2)    # would scoped-OOM
    assert kups.fits_bwd(64, 64, 128, 64, 2)
    assert kups.fits_bwd(32, 32, 256, 128, 2)
    assert kups.plan_fwd(128, 128, 64, 32, 2) >= 1
    monkeypatch.setattr(kups, "_VMEM_LIMIT_BYTES", 1)
    assert kups.plan_fwd(8, 8, 4, 4, 4) is None
    with pytest.raises(ValueError, match="fits_fwd"):
        kups._fwd_pallas(jnp.zeros((16, 16)), jnp.zeros((1, 10, 10, 4)))


@pytest.mark.parametrize("mode", ["fwd", "full"])
def test_upsample2x_conv3x3_pallas_integration(monkeypatch, mode):
    """The layer-level knob routes through the fused kernel (interpreted
    on CPU) and reproduces the default lax path — values AND gradients
    (bias included: its grad flows outside the kernel)."""
    monkeypatch.delenv("DVDGAN_UPS_PALLAS", raising=False)
    key = jax.random.PRNGKey(3)
    p = L.conv2d_init(key, 3, 8, 4)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 8))

    def loss(p, x):
        return (L.upsample2x_conv3x3(p, x).astype(jnp.float32) ** 2).mean()

    ref, gref = jax.value_and_grad(loss, argnums=(0, 1))(p, x), None
    ref, gref = ref[0], ref[1]
    monkeypatch.setenv("DVDGAN_UPS_PALLAS", mode)
    got, ggot = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
    assert np.allclose(float(ref), float(got), atol=1e-5)
    for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(ggot)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# --------------------------------------------- q-tiled spatial attention ---


@pytest.mark.parametrize("force_bqr", [None, 2, 4])
def test_tiled_attn_matches_reference_f32(force_bqr):
    """q-row-tiled kernel (interpret grid) == the shared reference across
    1-block and multi-block plans (kv recomputed per q-block)."""
    args = _rand_attn_inputs(jax.random.PRNGKey(50))
    out_k = ka.spatial_attn_tiled(*args, True, force_bqr)
    out_r = ka._spatial_attn_reference(*args)
    assert np.allclose(np.asarray(out_k), np.asarray(out_r), atol=1e-4)


def test_tiled_attn_gradients_match_reference():
    args = _rand_attn_inputs(jax.random.PRNGKey(51), n=1, h=4, w=4, c=8)

    def loss_k(*a):
        return (ka.spatial_attn_tiled(*a, True, 2)
                .astype(jnp.float32) ** 2).mean()

    def loss_r(*a):
        return (ka._spatial_attn_reference(*a).astype(jnp.float32) ** 2).mean()

    gk = jax.grad(loss_k, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(6)))(*args)
    for a, b in zip(gk, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tiled_attn_planner_covers_64sq(monkeypatch):
    """The 64² map (the shape the un-tiled kernel can NEVER hold) must
    plan; an impossible budget refuses loudly."""
    assert not ka.fits_vmem(64, 64, 64, 2)
    assert ka.fits_tiled(64, 64, 64, 2)
    assert 64 % ka.plan_tiled(64, 64, 64, 2) == 0
    assert not ka.fits_tiled(63, 64, 64, 2)          # odd H: no pooling
    monkeypatch.setattr(ka, "_TILED_VMEM_LIMIT_BYTES", 1)
    assert ka.plan_tiled(8, 8, 16, 4) is None
    with pytest.raises(ValueError, match="fits_tiled"):
        args = _rand_attn_inputs(jax.random.PRNGKey(52))
        ka._spatial_attn_tiled_pallas(*args, interpret=True)


def test_separable_attn_routes_tiled_at_large_maps(monkeypatch):
    """Auto-gate: DVDGAN_ATTN_PALLAS=on at a map too big for the un-tiled
    kernel routes through spatial_attn_tiled (interpret-stubbed) and
    matches the XLA path."""
    import unittest.mock as mock
    from dvdgan_tpu.ops import attention
    p = attention.separable_attn_init(jax.random.PRNGKey(53), 16)
    p["spatial"]["gamma"] = jnp.asarray(0.5, jnp.float32)
    p["temporal"]["gamma"] = jnp.asarray(0.3, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(54), (1, 2, 8, 8, 16))
    y_xla = attention.separable_attn(p, x, use_pallas=False)

    real = ka.spatial_attn_tiled
    called = {}

    def interp(x, wq, wk, wv, wo, gamma, interpret=False, force_bqr=None):
        called["hit"] = True
        return real(x, wq, wk, wv, wo, gamma, True, force_bqr)

    monkeypatch.setenv("DVDGAN_ATTN_PALLAS", "on")
    monkeypatch.setattr(attention.jax, "default_backend", lambda: "tpu")
    with mock.patch.object(attention.kernels.attention_spatial,
                           "fits_vmem", lambda *a, **k: False), \
         mock.patch.object(attention.kernels.attention_spatial,
                           "spatial_attn_tiled", interp):
        y_pl = attention.separable_attn(p, x)
    assert called.get("hit")
    assert np.allclose(np.asarray(y_xla), np.asarray(y_pl), atol=1e-4)


def test_ups2x_bwd_fallback_when_over_budget(monkeypatch):
    """mode "full" at a shape whose BACKWARD plan doesn't fit must fall
    back to the lax recompute VJP per level (the 256px top-level path) —
    gradients still match the oracle."""
    wall, xp = _ups_inputs(jax.random.PRNGKey(5), 1, 4, 4, 4, 4)
    monkeypatch.setattr(kups, "_BWD_VMEM_LIMIT_BYTES", 1)
    assert not kups.fits_bwd(4, 4, 4, 4, 4)

    def loss_k(wall, xp):
        return (kups.ups2x(wall, xp, True, True, 2)
                .astype(jnp.float32) ** 2).mean()

    def loss_r(wall, xp):
        return (kups._lax_oracle(wall, xp).astype(jnp.float32) ** 2).mean()

    gk = jax.grad(loss_k, argnums=(0, 1))(wall, xp)
    gr = jax.grad(loss_r, argnums=(0, 1))(wall, xp)
    for a, b in zip(gk, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)
