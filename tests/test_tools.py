"""Weight-converter round-trip: a torch-layout conv3d stack converts to the
npz layout I3DLikeFeatures loads, and the loaded net runs."""

import numpy as np

from dvdgan_tpu.eval import I3DLikeFeatures
from tools.convert_i3d_weights import convert


def test_convert_and_load(tmp_path):
    rng = np.random.RandomState(0)
    widths = [(3, 8), (8, 16)]
    sd = {}
    for i, (cin, cout) in enumerate(widths):
        sd[f"conv{i}.weight"] = rng.randn(cout, cin, 3, 3, 3).astype(np.float32)
        sd[f"conv{i}.bias"] = rng.randn(cout).astype(np.float32)
    out = str(tmp_path / "w.npz")
    assert convert(sd, out) == 2

    fx = I3DLikeFeatures(weights_npz=out)
    assert len(fx.params["blocks"]) == 2
    assert fx.params["blocks"][0]["w"].shape == (3, 3, 3, 3, 8)
    v = rng.randn(2, 4, 16, 16, 3).astype(np.float32)
    f = fx(v)
    assert f.shape == (2, 16) and np.isfinite(f).all()


def test_convert_handles_bias_free_convs(tmp_path):
    rng = np.random.RandomState(1)
    sd = {"a.weight": rng.randn(4, 3, 3, 3, 3).astype(np.float32),
          "b.weight": rng.randn(8, 4, 3, 3, 3).astype(np.float32)}
    out = str(tmp_path / "w2.npz")
    assert convert(sd, out) == 2
    loaded = np.load(out)
    assert np.allclose(loaded["block0_b"], 0.0)
