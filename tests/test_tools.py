"""I3D weight-converter golden tests (VERDICT r1 missing #2): conversion
maps BY MODULE NAME onto the canonical topology, validates shapes, and the
loaded network runs. Fake checkpoints are synthesized from the topology
spec itself, so any drift between converter and network fails here."""

import json

import numpy as np
import pytest

from dvdgan_tpu.eval import I3DFeatures, i3d
from tools.convert_i3d_weights import _unit_prefixes, convert


def _fake_torch_sd(rng):
    """A pytorch-i3d-style state_dict with correct names/shapes."""
    sd = {}
    for key, shape in i3d.param_shapes().items():
        unit, torch_prefix, _ = _unit_prefixes(key)
        if key.endswith("/w"):
            # DHWIO -> torch OIDHW
            w = rng.randn(*shape).astype(np.float32) * 0.05
            sd[f"{torch_prefix}.conv3d.weight"] = w.transpose(4, 3, 0, 1, 2)
        elif key == "logits/b":
            sd["logits.conv3d.bias"] = rng.randn(*shape).astype(np.float32)
        else:
            t = {"scale": "weight", "offset": "bias", "mean": "running_mean",
                 "var": "running_var"}[key.split("/")[-1]]
            v = rng.rand(*shape).astype(np.float32)
            if t == "running_var":
                v += 0.5
            sd[f"{torch_prefix}.bn.{t}"] = v
    return sd


def test_param_count_is_real_i3d():
    # Inflated Inception-v1 + Kinetics-400 logits: ~12.7M params. A
    # sequential stack (the r1 bug) is nowhere near this.
    n = i3d.n_params()
    assert 12_000_000 < n < 13_500_000, n


def test_convert_torch_style_and_run(tmp_path):
    rng = np.random.RandomState(0)
    sd = _fake_torch_sd(rng)
    out = str(tmp_path / "i3d.npz")
    n = convert(sd, out)
    assert n == len(i3d.param_shapes())

    fx = I3DFeatures(weights_npz=out, resize=None)
    assert fx.pretrained
    v = rng.rand(2, 8, 32, 32, 3).astype(np.float32) * 2 - 1
    f = fx(v)
    assert f.shape == (2, 400) and np.isfinite(f).all()

    # name-mapping (not encounter order): kernel lands under its own unit
    loaded = np.load(out)
    want = sd["Mixed_4d.b1b.conv3d.weight"].transpose(2, 3, 4, 1, 0)
    assert np.array_equal(loaded["Mixed_4d/b1b/w"], want)


def test_convert_tf_style_defaults_gamma(tmp_path):
    """TF I3D checkpoints have no BN gamma (scale=False) and DHWIO kernels
    under scoped names; conversion fills scale=1 and maps by path."""
    rng = np.random.RandomState(1)
    sd = {}
    for key, shape in i3d.param_shapes().items():
        _, _, tf_path = _unit_prefixes(key)
        scope = f"RGB/inception_i3d/{tf_path}"
        leaf = key.split("/")[-1]
        if key.endswith("/w"):
            sd[f"{scope}/conv_3d/w"] = rng.randn(*shape).astype(np.float32) * 0.05
        elif key == "logits/b":
            sd[f"{scope}/conv_3d/b"] = rng.randn(*shape).astype(np.float32)
        elif leaf in ("offset", "mean", "var"):
            t = {"offset": "beta", "mean": "moving_mean",
                 "var": "moving_variance"}[leaf]
            sd[f"{scope}/batch_norm/{t}"] = rng.rand(*shape).astype(np.float32) + 0.1
        # no gamma on purpose
    out = str(tmp_path / "i3d_tf.npz")
    assert convert(sd, out) == len(i3d.param_shapes())
    loaded = np.load(out)
    assert np.array_equal(loaded["Mixed_3b/b0/bn/scale"],
                          np.ones(64, np.float32))


def test_convert_rejects_wrong_architecture(tmp_path):
    rng = np.random.RandomState(2)
    sd = {"conv0.conv3d.weight": rng.randn(8, 3, 3, 3, 3).astype(np.float32)}
    with pytest.raises(ValueError, match="does not map"):
        convert(sd, str(tmp_path / "bad.npz"))


def test_load_npz_rejects_shape_mismatch(tmp_path):
    rng = np.random.RandomState(3)
    sd = _fake_torch_sd(rng)
    out = str(tmp_path / "i3d2.npz")
    convert(sd, out)
    arrays = dict(np.load(out))
    arrays["Conv3d_1a_7x7/w"] = arrays["Conv3d_1a_7x7/w"][..., :32]
    np.savez(out, **arrays)
    with pytest.raises(ValueError, match="topology"):
        i3d.load_npz(out)


# --------------------------------------------- Inception-v3 (frame FID) ----

from dvdgan_tpu.eval import InceptionFeatures, inception as iv3
from tools.convert_inception_weights import convert as convert_iv3


def _fake_torchvision_sd(rng):
    """A torchvision-inception_v3-style state_dict (correct names/shapes)."""
    sd = {}
    for key, shape in iv3.param_shapes().items():
        if key == "fc/w":
            sd["fc.weight"] = rng.randn(shape[1], shape[0]).astype(np.float32) * 0.02
        elif key == "fc/b":
            sd["fc.bias"] = rng.randn(*shape).astype(np.float32)
        elif key.endswith("/w"):
            unit = key[:-2].replace("/", ".")
            w = rng.randn(*shape).astype(np.float32) * 0.05
            sd[f"{unit}.conv.weight"] = w.transpose(3, 2, 0, 1)  # HWIO->OIHW
        else:
            unit, leaf = key.split("/bn/")
            t = {"scale": "weight", "offset": "bias", "mean": "running_mean",
                 "var": "running_var"}[leaf]
            v = rng.rand(*shape).astype(np.float32)
            if t == "running_var":
                v += 0.5
            sd[f"{unit.replace('/', '.')}.bn.{t}"] = v
    return sd


def test_inception_param_count_is_torchvision():
    # inception_v3 without the aux head: ~23.9M params (27.2M - 3.4M aux)
    n = iv3.n_params()
    assert 23_000_000 < n < 24_500_000, n


def test_convert_inception_and_run(tmp_path):
    rng = np.random.RandomState(0)
    sd = _fake_torchvision_sd(rng)
    out = str(tmp_path / "iv3.npz")
    n = convert_iv3(sd, out)
    assert n == len(iv3.param_shapes())

    fx = InceptionFeatures(weights_npz=out, resize=75)
    assert fx.pretrained
    v = rng.rand(2, 3, 64, 64, 3).astype(np.float32) * 2 - 1
    f = fx(v)                       # clips fold to frames
    assert f.shape == (6, 2048) and np.isfinite(f).all()

    loaded = np.load(out)
    want = sd["Mixed_6b.branch7x7_2.conv.weight"].transpose(2, 3, 1, 0)
    assert np.array_equal(loaded["Mixed_6b/branch7x7_2/w"], want)


def test_convert_inception_rejects_wrong_arch(tmp_path):
    sd = {"conv1.conv.weight": np.zeros((8, 3, 3, 3), np.float32)}
    with pytest.raises(ValueError, match="does not map"):
        convert_iv3(sd, str(tmp_path / "bad.npz"))


# ------------------------------------------------- C3D (UCF-101 video IS) ----

from dvdgan_tpu.eval import C3DFeatures, c3d
from tools.convert_c3d_weights import convert as convert_c3d


def _fake_c3d_sd(rng, n_classes=101):
    """A DavideA-c3d-pytorch-style state_dict (correct names/shapes)."""
    sd = {}
    for name, cin, cout in c3d._CONVS:
        sd[f"{name}.weight"] = (rng.randn(cout, cin, 3, 3, 3)
                                .astype(np.float32) * 0.02)
        sd[f"{name}.bias"] = rng.randn(cout).astype(np.float32) * 0.01
    dims = {"fc6": (c3d.FLAT_DIM, c3d.FC_DIM),
            "fc7": (c3d.FC_DIM, c3d.FC_DIM),
            "fc8": (c3d.FC_DIM, n_classes)}
    for name, (din, dout) in dims.items():
        sd[f"{name}.weight"] = (rng.randn(dout, din).astype(np.float32)
                                * (1.0 / np.sqrt(din)))
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32) * 0.01
    return sd


def test_c3d_param_count():
    # canonical C3D ≈ 78M params (UCF-101 101-way head)
    n = c3d.n_params()
    assert 77_000_000 < n < 80_000_000, n


def test_convert_c3d_and_run(tmp_path):
    rng = np.random.RandomState(0)
    sd = _fake_c3d_sd(rng)
    out = str(tmp_path / "c3d.npz")
    mean = rng.rand(3).astype(np.float32) * 100
    n = convert_c3d(sd, out, input_mean=mean, input_bgr=True)
    assert n == len(c3d.param_shapes())

    fx = C3DFeatures(weights_npz=out)
    assert fx.pretrained and fx.input_bgr
    np.testing.assert_array_equal(fx.input_mean, mean)
    v = rng.rand(1, 16, 64, 64, 3).astype(np.float32) * 2 - 1
    f = fx(v)
    assert f.shape == (1, 101) and np.isfinite(f).all()

    loaded = np.load(out)
    want = sd["conv3b.weight"].transpose(2, 3, 4, 1, 0)
    assert np.array_equal(loaded["conv3b/w"], want)


def test_c3d_fc6_flatten_permutation():
    """The converter's fc6 column permutation must make our (T,H,W,C)
    flatten reproduce torch's (C,T,H,W)-flatten matmul exactly."""
    rng = np.random.RandomState(1)
    w_torch = rng.randn(c3d.FC_DIM, c3d.FLAT_DIM).astype(np.float32)
    x = rng.randn(512, 1, 4, 4).astype(np.float32)        # (C, T, H, W)
    y_torch = w_torch @ x.reshape(-1)                     # torch order
    w6 = w_torch.reshape(c3d.FC_DIM, 512, 1, 4, 4)
    w6 = w6.transpose(0, 2, 3, 4, 1).reshape(c3d.FC_DIM, c3d.FLAT_DIM)
    y_ours = x.transpose(1, 2, 3, 0).reshape(-1) @ w6.T   # (T,H,W,C) order
    np.testing.assert_allclose(y_ours, y_torch, rtol=1e-4, atol=1e-3)


def test_convert_c3d_rejects_wrong_arch(tmp_path):
    sd = {"conv1.weight": np.zeros((8, 3, 3, 3, 3), np.float32)}
    with pytest.raises(ValueError, match="does not map"):
        convert_c3d(sd, str(tmp_path / "bad.npz"))


def test_export_serving_roundtrip(tmp_path):
    """The serialized-StableHLO sampler artifact (tools/export_serving)
    reproduces step.sample after serialize->deserialize, for both
    synthesis and FP (conditioned) models. Tolerances, not bitwise: the
    artifact bakes the weights in as CONSTANTS, which XLA folds/fuses
    differently than runtime arguments (reassociation-level drift)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
    from dvdgan_tpu.train import TrainConfig, create
    from dvdgan_tpu.train import step as step_mod
    from tools.export_serving import export_sampler

    g_cfg = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                    emb_dim=16, attn_res=16)
    st = create(jax.random.PRNGKey(0), g_cfg,
                DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2),
                DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5),
                TrainConfig(d_steps=1, batch_size=2))
    blob = export_sampler(st, g_cfg, batch=2, platforms=("cpu",))
    fn = jexport.deserialize(bytearray(blob))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 120))
    y = jnp.asarray([0, 3], jnp.int32)
    got = np.asarray(fn.call(z, y))
    want = np.asarray(step_mod.sample(
        jax.device_get(st["g_ema"]), jax.device_get(st["g"]["stats"]),
        jax.device_get(st["g"]["sn_u"]), z, y, g_cfg=g_cfg))
    assert got.shape == (2, 4, 32, 32, 3)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-2)

    # FP: conditioned artifact takes (z, y, cond)
    fp_g = GConfig(img_size=32, n_frames=2, ch=8, z_dim=120, n_classes=5,
                   emb_dim=16, attn_res=16, cond_frames=2)
    st2 = create(jax.random.PRNGKey(0), fp_g,
                 DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2),
                 DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5),
                 TrainConfig(d_steps=1, batch_size=2))
    blob2 = export_sampler(st2, fp_g, batch=2, platforms=("cpu",))
    fn2 = jexport.deserialize(bytearray(blob2))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 32, 32, 3))
    got2 = np.asarray(fn2.call(z, y, cond))
    want2 = np.asarray(step_mod.sample(
        jax.device_get(st2["g_ema"]), jax.device_get(st2["g"]["stats"]),
        jax.device_get(st2["g"]["sn_u"]), z, y, g_cfg=fp_g,
        cond_video=cond))
    assert got2.shape == (2, 2, 32, 32, 3)
    np.testing.assert_allclose(got2, want2, atol=5e-3, rtol=5e-2)


def test_export_serving_polymorphic_batch(tmp_path):
    """--serve_batch 0 exports ONE batch-polymorphic artifact (jax.export
    symbolic dim) that serves any request batch; outputs match fixed-shape
    step.sample at each batch."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
    from dvdgan_tpu.train import TrainConfig, create
    from dvdgan_tpu.train import step as step_mod
    from tools.export_serving import export_sampler

    g_cfg = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                    emb_dim=16, attn_res=16, cond_frames=2)
    st = create(jax.random.PRNGKey(0), g_cfg,
                DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2),
                DTConfig(img_size=32, n_frames=6, ch=8, n_classes=5),
                TrainConfig(d_steps=1, batch_size=2))
    fn = jexport.deserialize(bytearray(
        export_sampler(st, g_cfg, batch=0, platforms=("cpu",))))
    ema = jax.device_get(st["g_ema"])
    stats = jax.device_get(st["g"]["stats"])
    sn_u = jax.device_get(st["g"]["sn_u"])
    for b in (1, 3):
        z = jax.random.normal(jax.random.PRNGKey(b), (b, 120))
        y = jnp.zeros((b,), jnp.int32)
        cond = jax.random.normal(jax.random.PRNGKey(b + 9),
                                 (b, 2, 32, 32, 3))
        got = np.asarray(fn.call(z, y, cond))
        want = np.asarray(step_mod.sample(ema, stats, sn_u, z, y,
                                          g_cfg=g_cfg, cond_video=cond))
        assert got.shape == (b, 4, 32, 32, 3)
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-2)


def test_export_serving_bf16_artifact():
    """--serve_dtype bfloat16: ~half-size artifact, f32 in/out interface,
    output within bf16-mantissa drift of the f32 artifact."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
    from dvdgan_tpu.train import TrainConfig, create
    from tools.export_serving import export_sampler

    g_cfg = GConfig(img_size=32, n_frames=4, ch=8, z_dim=120, n_classes=5,
                    emb_dim=16, attn_res=16)
    st = create(jax.random.PRNGKey(0), g_cfg,
                DSConfig(img_size=32, ch=8, n_classes=5, k_frames=2),
                DTConfig(img_size=32, n_frames=4, ch=8, n_classes=5),
                TrainConfig(d_steps=1, batch_size=2))
    blob32 = export_sampler(st, g_cfg, batch=2, platforms=("cpu",))
    blob16 = export_sampler(st, g_cfg, batch=2, platforms=("cpu",),
                            dtype="bfloat16")
    ex32 = jexport.deserialize(bytearray(blob32))
    ex16 = jexport.deserialize(bytearray(blob16))
    # the bf16 artifact really bakes bf16 weight constants / compute (at
    # tiny test widths the MLIR program, not the weights, dominates blob
    # size — check the types, not the byte count)
    # type token "bf16>" (as in tensor<...xbf16>), NOT bare "bf16": the
    # MLIR location metadata contains this very test's name
    assert "bf16>" in ex16.mlir_module()
    assert "bf16>" not in ex32.mlir_module()

    z = jax.random.normal(jax.random.PRNGKey(1), (2, 120), jnp.float32)
    y = jnp.asarray([0, 3], jnp.int32)
    got32 = np.asarray(ex32.call(z, y))
    got16 = np.asarray(ex16.call(z, y))
    assert got16.dtype == np.float32            # interface stays f32
    assert np.isfinite(got16).all()
    # bf16 forward drift on tanh-bounded video: nonzero (bf16 actually
    # ran) but mantissa-level
    d = np.abs(got16 - got32).max()
    assert 0 < d < 0.06, d

    import pytest as _pytest
    with _pytest.raises(ValueError, match="dtype"):
        export_sampler(st, g_cfg, batch=2, dtype="fp8")


@pytest.mark.slow
def test_autotune_coordinate_descent(tmp_path):
    """tools/autotune adopts only knob values whose median beats the
    champion by more than the noise threshold, composes adopted settings
    into later trials, refuses stale fallback benches, and writes the
    chosen env."""
    import json
    import subprocess
    import sys

    from tools import autotune

    stub = tmp_path / "stub_bench.py"
    stub.write_text(
        "import json, os\n"
        "v = 10.0\n"
        "if os.environ.get('DVDGAN_TM_FAKES') == 'on': v += 1.0\n"
        "if os.environ.get('DVDGAN_TPHASE_INTERLEAVE') == 'moveaxis':"
        " v -= 2.0\n"
        "if os.environ.get('DVDGAN_TEMPORAL_ATTN') == 'einsum': v += 0.05\n"
        "print('noise line')\n"
        "print(json.dumps({'value': v, 'measured_this_run': True}))\n")
    logs = []
    rep = autotune.tune(reps=2, threshold_pct=1.0,
                        bench_cmd=[sys.executable, str(stub)],
                        log=logs.append)
    assert rep["baseline"] == 10.0
    # TM_FAKES=on (+10%) adopted; moveaxis (-20%) and einsum (+0.5% of
    # 11.0 -> below the 1% threshold) rejected
    assert rep["chosen_env"] == {"DVDGAN_TM_FAKES": "on"}
    assert rep["champion"] == 11.0
    # later trials run on top of adopted settings
    einsum_trial = [t for t in rep["trials"]
                    if t["var"] == "DVDGAN_TEMPORAL_ATTN"
                    and t["value"] == "einsum"][0]
    assert einsum_trial["env"] == {"DVDGAN_TM_FAKES": "on"}
    assert einsum_trial["median"] == 11.05

    # the CLI writes shell export lines
    out = tmp_path / "tuned.env"
    autotune.main(["--reps", "1", "--bench_cmd",
                   f"{sys.executable} {stub}", "--out", str(out)])
    assert "export DVDGAN_TM_FAKES=on\n" in out.read_text()

    # a stale device-down fallback line must be refused, not tuned on
    stale = tmp_path / "stale_bench.py"
    stale.write_text("import json\n"
                     "print(json.dumps({'value': 24.8,"
                     " 'measured_this_run': False}))\n")
    with pytest.raises(RuntimeError, match="stale"):
        autotune.run_bench([sys.executable, str(stale)], {}, 1, 60.0)

    # a crashing bench surfaces, never silently skips a rep
    boom = tmp_path / "boom.py"
    boom.write_text("raise SystemExit(2)\n")
    with pytest.raises(RuntimeError, match="bench failed"):
        autotune.run_bench([sys.executable, str(boom)], {}, 1, 60.0)


def test_ab_inprocess_shared_init(monkeypatch):
    """tools/ab_inprocess runs each trace-time-knob variant off ONE shared
    init, reports per-variant medians, and restores the caller's knob env
    afterwards (a later trace must not inherit the last variant's env)."""
    import os

    from tools import ab_inprocess

    monkeypatch.setenv("DVDGAN_DT_PREPOOL", "on")   # caller-set value
    monkeypatch.delenv("DVDGAN_TM_FAKES", raising=False)
    logs = []
    res = ab_inprocess.run(
        [("base", {}), ("flip", {"DVDGAN_DT_PREPOOL": "off",
                                 "DVDGAN_TM_FAKES": "on"})],
        {"img_size": "32", "n_frames": "4", "ch": "8", "batch": "2"},
        reps=1, steps=1, calls=1, log=logs.append)
    assert [r["variant"] for r in res] == ["base", "flip"]
    assert all(r["median"] > 0 for r in res)
    assert res[1]["env"]["DVDGAN_TM_FAKES"] == "on"
    assert len(logs) == 2
    # env restored: the flip variant's settings did not leak out
    assert os.environ.get("DVDGAN_DT_PREPOOL") == "on"
    assert "DVDGAN_TM_FAKES" not in os.environ

    # variant spec parsing
    name, env = ab_inprocess.parse_variant("fast:DVDGAN_DT_PREPOOL=off")
    assert name == "fast" and env == {"DVDGAN_DT_PREPOOL": "off"}
    assert ab_inprocess.parse_variant("defaults:") == ("defaults", {})
    with pytest.raises(ValueError, match="no ':'"):
        ab_inprocess.parse_variant("DVDGAN_DT_PREPOOL=off")   # label-less
    with pytest.raises(ValueError, match="malformed"):
        ab_inprocess.parse_variant("typo:DVDGAN_DT_PREPOOL")  # no '='
    with pytest.raises(ValueError, match="malformed"):
        # the dangerous case: a MIXED spec whose typo'd segment used to be
        # silently dropped — benching prepool_off-only under a combo label
        ab_inprocess.parse_variant(
            "combo:DVDGAN_DT_PREPOOL=off,DVDGAN_TM_FAKES")
    # trailing comma is harmless, not a typo
    assert ab_inprocess.parse_variant("a:K=v,") == ("a", {"K": "v"})


def test_ab_inprocess_foreign_knob_isolation(monkeypatch):
    """A --variant var OUTSIDE the built-in TRACE_TIME_KNOBS tuple must be
    reset before every later variant and restored after the sweep (it used
    to leak into subsequent variants and the caller's env permanently)."""
    import os

    from tools import ab_inprocess

    monkeypatch.delenv("DVDGAN_FAKE_KNOB", raising=False)
    seen = []

    def spy(name, env, knobs, *a, **k):
        for k2 in knobs:
            os.environ.pop(k2, None)
        os.environ.update(env)
        seen.append((name, os.environ.get("DVDGAN_FAKE_KNOB")))
        return {"variant": name, "env": env, "median": 1.0}

    monkeypatch.setattr(ab_inprocess, "_run_variant", spy)
    monkeypatch.setattr(
        "tools._bench_common.init_state_and_batch",
        lambda *a, **k: (({},), None, None))
    ab_inprocess.run(
        [("dirty", {"DVDGAN_FAKE_KNOB": "x"}), ("clean", {})],
        {"img_size": "32", "n_frames": "4", "ch": "8", "batch": "2"},
        reps=1, steps=1, calls=1, log=lambda s: None)
    assert seen == [("dirty", "x"), ("clean", None)]
    assert "DVDGAN_FAKE_KNOB" not in os.environ


def test_bench_loader_end_to_end(capsys):
    """tools/bench_loader measures _make_batch assembly directly (the
    prefetch-iterator timing it replaced overstated clips/s by the queue's
    pipeline-fill head start, enough to flip keeps_up near margin 1.0) and
    must not leak decode pools across the --threads sweep."""
    import threading

    from tools import bench_loader

    n0 = threading.active_count()
    bench_loader.main([
        "--img_size", "16", "--n_frames", "4", "--batch", "2",
        "--threads", "1,2", "--batches", "2", "--n_videos", "4",
        "--src_size", "24", "--src_frames", "6",
        "--demand_steps", "0.001",
    ])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert [ln["threads"] for ln in lines] == [1, 2]
    for ln in lines:
        assert ln["metric"] == "loader_clips_per_sec" and ln["value"] > 0
        assert ln["keeps_up"] and ln["margin"] > 0
    # every swept Loader's pool was shut down (close() in measure)
    assert threading.active_count() <= n0 + 1
