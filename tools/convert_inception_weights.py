"""Convert a pretrained Inception-v3 checkpoint (torchvision naming) →
the npz layout `dvdgan_tpu.eval.inception` loads, BY MODULE NAME, with
full shape validation (same contract as tools/convert_i3d_weights.py).

Source naming (torchvision `inception_v3` state_dict, aux head ignored):
    Conv2d_1a_3x3.conv.weight              (Cout, Cin, kH, kW)
    Conv2d_1a_3x3.bn.{weight,bias,running_mean,running_var}
    Mixed_5b.branch5x5_1.conv.weight, ... , fc.{weight,bias}

Usage:
    python tools/convert_inception_weights.py inception_v3.pth out.npz
    python main.py --mode eval --inception_weights out.npz ...
"""

from __future__ import annotations

import sys

import numpy as np

try:
    from tools._convert_common import as_numpy as _as_numpy
except ImportError:       # run as a loose script from tools/
    from _convert_common import as_numpy as _as_numpy

from dvdgan_tpu.eval import inception as iv3


def convert(state_dict: dict, out_path: str) -> int:
    sd = {k: v for k, v in state_dict.items() if not k.startswith("AuxLogits")}
    expected = iv3.param_shapes()
    out: dict[str, np.ndarray] = {}
    problems: list[str] = []

    units = sorted({(k.split("/bn/")[0] if "/bn/" in k else
                     k.rsplit("/", 1)[0])
                    for k in expected if not k.startswith("fc/")})
    for unit in units:
        torch_prefix = unit.replace("/", ".")
        w = sd.get(f"{torch_prefix}.conv.weight")
        if w is None:
            problems.append(f"{unit}: conv kernel not found")
            continue
        w = _as_numpy(w).transpose(2, 3, 1, 0)       # OIHW -> HWIO
        out[f"{unit}/w"] = w
        cout = w.shape[-1]
        for s, t in (("scale", "weight"), ("offset", "bias"),
                     ("mean", "running_mean"), ("var", "running_var")):
            v = sd.get(f"{torch_prefix}.bn.{t}")
            if v is None:
                problems.append(f"{unit}: bn {t} missing")
                v = (np.ones(cout, np.float32) if s in ("scale", "var")
                     else np.zeros(cout, np.float32))
            else:
                v = _as_numpy(v)
            out[f"{unit}/bn/{s}"] = v
    if "fc.weight" in sd:
        out["fc/w"] = _as_numpy(sd["fc.weight"]).T   # (1000,2048)->(2048,1000)
        out["fc/b"] = (_as_numpy(sd["fc.bias"]) if "fc.bias" in sd
                       else np.zeros(iv3.NUM_CLASSES, np.float32))
    else:
        problems.append("fc.weight not found")

    shape_bad = [f"{k}: got {tuple(out[k].shape)}, want {tuple(expected[k])}"
                 for k in expected if k in out
                 and tuple(out[k].shape) != tuple(expected[k])]
    missing = sorted(set(expected) - set(out))
    if problems or shape_bad or missing:
        raise ValueError(
            "checkpoint does not map onto the Inception-v3 topology:\n  "
            + "\n  ".join(problems + shape_bad
                          + [f"missing: {m}" for m in missing[:10]]))
    np.savez(out_path, **out)
    iv3.load_npz(out_path)
    return len(out)


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    src, dst = sys.argv[1], sys.argv[2]
    if src.endswith(".npz"):
        sd = dict(np.load(src))
    else:
        import torch
        sd = torch.load(src, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if "state_dict" in sd:
            sd = sd["state_dict"]
    n = convert(sd, dst)
    print(f"converted {n} tensors ({iv3.n_params():,} params) -> {dst}")


if __name__ == "__main__":
    main()
