"""Convert pretrained C3D checkpoints → the npz layout
`dvdgan_tpu.eval.c3d` loads (published UCF-101 IS protocol, BASELINE.md
row 1; same name-mapped discipline as tools/convert_i3d_weights.py).

Source naming scheme: the common PyTorch C3D port (DavideA/c3d-pytorch and
the UCF-101 fine-tunes derived from it):

    conv1.weight (Cout, Cin, kT, kH, kW), conv1.bias,
    conv2., conv3a., conv3b., conv4a., conv4b., conv5a., conv5b.,
    fc6.weight (4096, 8192), fc6.bias, fc7.*, fc8.* (n_classes, 4096)

Layout fixes applied here so apply() never transposes activations:
  * conv weights OIDHW -> DHWIO;
  * fc weights (out, in) -> (in, out);
  * fc6's 8192 input columns are (C=512, T=1, H=4, W=4)-ordered in torch
    (NCDHW flatten) but our NDHWC flatten is (T, H, W, C)-ordered — the
    columns are permuted to match.

The protocol's mean subtraction travels WITH the weights: pass a mean file
(npy, (16,112,112,3) cube or (3,) channel means) and/or --bgr for
caffe-lineage BGR models; both are embedded in the npz and applied by
eval.features.C3DFeatures automatically.

    python tools/convert_c3d_weights.py c3d_ucf101.pth out.npz \\
        [--mean mean.npy] [--bgr]
    python main.py --mode eval --is_protocol c3d --c3d_weights out.npz ...
"""

from __future__ import annotations

import sys

import numpy as np

try:
    from tools._convert_common import as_numpy as _as_numpy
except ImportError:       # run as a loose script from tools/
    from _convert_common import as_numpy as _as_numpy

from dvdgan_tpu.eval import c3d


def convert(state_dict: dict, out_path: str, input_mean=None,
            input_bgr: bool = False) -> int:
    """state_dict (torch-style names) -> validated npz. Returns the number
    of tensors written. Raises ValueError if the checkpoint does not map."""
    sd = {k: _as_numpy(v) for k, v in state_dict.items()}
    missing = [f"{name}.{leaf}" for name, _, _ in c3d._CONVS
               for leaf in ("weight", "bias") if f"{name}.{leaf}" not in sd]
    missing += [f"fc{i}.{leaf}" for i in (6, 7, 8)
                for leaf in ("weight", "bias") if f"fc{i}.{leaf}" not in sd]
    if missing:
        raise ValueError(
            f"checkpoint does not map onto C3D: missing {missing[:6]}...")

    params = {}
    for name, _, _ in c3d._CONVS:
        params[f"{name}/w"] = sd[f"{name}.weight"].transpose(2, 3, 4, 1, 0)
        params[f"{name}/b"] = sd[f"{name}.bias"]
    # fc6: permute (C,T,H,W)-ordered columns to our (T,H,W,C) flatten
    w6 = sd["fc6.weight"].reshape(c3d.FC_DIM, 512, 1, 4, 4)
    w6 = w6.transpose(0, 2, 3, 4, 1).reshape(c3d.FC_DIM, c3d.FLAT_DIM)
    params["fc6/w"] = w6.T
    params["fc6/b"] = sd["fc6.bias"]
    params["fc7/w"] = sd["fc7.weight"].T
    params["fc7/b"] = sd["fc7.bias"]
    params["fc8/w"] = sd["fc8.weight"].T
    params["fc8/b"] = sd["fc8.bias"]

    c3d.save_npz(out_path, params, input_mean=input_mean,
                 input_bgr=input_bgr)
    c3d.load_npz(out_path)          # round-trip topology validation
    return len(params)


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 2
    ckpt_path, out_path = argv[1], argv[2]
    input_mean = None
    input_bgr = "--bgr" in argv
    if "--mean" in argv:
        input_mean = np.load(argv[argv.index("--mean") + 1])
    if ckpt_path.endswith(".npz"):
        sd = dict(np.load(ckpt_path))
    else:
        import torch
        sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
    n = convert(sd, out_path, input_mean=input_mean, input_bgr=input_bgr)
    print(f"wrote {n} tensors -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
