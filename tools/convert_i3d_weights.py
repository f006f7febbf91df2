"""Convert pretrained 3-D conv video-net weights (torch) → the npz layout
`dvdgan_tpu.eval.features.I3DLikeFeatures` loads (SURVEY.md §2.17 / §7.9).

Published FVD uses an I3D net pretrained on Kinetics-400; this sandbox has
no network, so the conversion runs wherever the weights exist and the npz
ships with the data. Any torch state_dict whose conv3d kernels follow the
(Cout, Cin, kT, kH, kW) convention works — layers are taken in order and
re-laid-out to DHWIO (kT, kH, kW, Cin, Cout).

Usage:
    python tools/convert_i3d_weights.py checkpoint.pth out.npz
    python main.py --mode eval ...   # I3DLikeFeatures(weights_npz="out.npz")
"""

from __future__ import annotations

import sys

import numpy as np


def convert(state_dict, out_path: str) -> int:
    """Write block{i}_w / block{i}_b arrays in encounter order. Returns the
    number of conv3d layers converted."""
    i = 0
    arrays = {}
    pending_w = None
    for name, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        if arr.ndim == 5:                      # conv3d kernel OIDHW
            if pending_w is not None:          # previous conv had no bias
                arrays[f"block{i}_w"] = pending_w
                arrays[f"block{i}_b"] = np.zeros(pending_w.shape[-1],
                                                 np.float32)
                i += 1
            # (Cout, Cin, kT, kH, kW) -> (kT, kH, kW, Cin, Cout)
            pending_w = arr.transpose(2, 3, 4, 1, 0).astype(np.float32)
        elif arr.ndim == 1 and pending_w is not None \
                and arr.shape[0] == pending_w.shape[-1] and "bias" in name:
            arrays[f"block{i}_w"] = pending_w
            arrays[f"block{i}_b"] = arr.astype(np.float32)
            pending_w = None
            i += 1
    if pending_w is not None:
        arrays[f"block{i}_w"] = pending_w
        arrays[f"block{i}_b"] = np.zeros(pending_w.shape[-1], np.float32)
        i += 1
    np.savez(out_path, **arrays)
    return i


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    import torch
    sd = torch.load(sys.argv[1], map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    n = convert(sd, sys.argv[2])
    print(f"converted {n} conv3d layers -> {sys.argv[2]}")


if __name__ == "__main__":
    main()
