"""Convert InceptionV3 weights (torchvision / pytorch-fid) to the
locate-tpu .npz schema (`locate-tpu-inception-v3/v1`).

Run this WHEREVER NETWORK + torchvision EXIST (this repo's build
environment has neither — BASELINE.md "Open items"), then vendor the
resulting .npz next to the checkpoints:

    # stock torchvision ImageNet weights
    python scripts/convert_inception.py --out inception_v3_tv.npz

    # pytorch-fid's pt_inception-2015-12-05 weights (the ones every
    # published FID number uses) — download the .pth first:
    #   https://github.com/mseitzer/pytorch-fid/releases/download/\
    #       fid_weights/pt_inception-2015-12-05-6726825d.pth
    python scripts/convert_inception.py \
        --state-dict pt_inception-2015-12-05-6726825d.pth --variant fid \
        --out inception_v3_fid.npz

Then:

    locate-tpu eval lsun_bedroom_128 --extractor=inception_v3_fid.npz \
        --samples=50000

`fold_state_dict` is pure (arrays in, arrays out) and unit-tested offline
against the JAX graph with random weights (tests/test_inception.py) — the
only network-needing part of this file is fetching the weights.

Schema (see locate_tpu/io/inception.py docstring): per BasicConv2d path P,
`{P}.w` = HWIO conv kernel with BN scale gamma/sqrt(var+eps) folded in,
`{P}.b` = beta - running_mean * scale; plus `format`, `variant`,
`input_mean`, `input_std`.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm2d eps

# input normalization applied after uint8 -> [0,1] (see inception.py)
INPUT_STATS = {
    # torchvision ImageNet preprocessing
    "torchvision": ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    # pytorch-fid normalizes [0,1] -> [-1,1]
    "fid": ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
}


def fold_state_dict(state_dict, variant: str = "torchvision") -> dict:
    """PyTorch inception_v3 state_dict -> flat npz dict with BN folded.

    Accepts torch tensors or numpy arrays. Expects torchvision naming:
    `{path}.conv.weight` (OIHW), `{path}.bn.{weight,bias,running_mean,
    running_var}`.
    """
    from locate_tpu.io.inception import FORMAT, conv_specs

    def arr(x):
        return np.asarray(getattr(x, "detach", lambda: x)().cpu().numpy()
                          if hasattr(x, "detach") else x, np.float64)

    out = {}
    for path, cin, cout, k, _, _ in conv_specs():
        w = arr(state_dict[f"{path}.conv.weight"])  # OIHW
        gamma = arr(state_dict[f"{path}.bn.weight"])
        beta = arr(state_dict[f"{path}.bn.bias"])
        mean = arr(state_dict[f"{path}.bn.running_mean"])
        var = arr(state_dict[f"{path}.bn.running_var"])
        if w.shape != (cout, cin, k[0], k[1]):
            raise ValueError(
                f"{path}.conv.weight has shape {w.shape}, expected "
                f"{(cout, cin, k[0], k[1])}"
            )
        scale = gamma / np.sqrt(var + BN_EPS)
        w = w.transpose(2, 3, 1, 0) * scale  # OIHW -> HWIO, fold scale into O
        out[f"{path}.w"] = w.astype(np.float32)
        out[f"{path}.b"] = (beta - mean * scale).astype(np.float32)
    # classifier head (optional in the schema; enables Inception Score):
    # torchvision fc (1000 classes), pt_inception fc (1008). Stored as
    # (2048, n_classes) so logits = pool3 @ fc.w + fc.b.
    if "fc.weight" in state_dict:
        out["fc.w"] = arr(state_dict["fc.weight"]).T.astype(np.float32)
        out["fc.b"] = arr(state_dict["fc.bias"]).astype(np.float32)
    mean_in, std_in = INPUT_STATS[variant]
    out["format"] = np.asarray(FORMAT)
    out["variant"] = np.asarray(variant)
    out["input_mean"] = np.asarray(mean_in, np.float32)
    out["input_std"] = np.asarray(std_in, np.float32)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument(
        "--variant", choices=("torchvision", "fid"), default="torchvision"
    )
    ap.add_argument(
        "--state-dict",
        help=".pth state dict to convert (default: download torchvision's "
        "pretrained inception_v3 — requires network + torchvision)",
    )
    args = ap.parse_args(argv)

    import torch

    if args.state_dict:
        sd = torch.load(args.state_dict, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    else:
        import torchvision

        model = torchvision.models.inception_v3(
            weights=torchvision.models.Inception_V3_Weights.IMAGENET1K_V1
        )
        sd = model.state_dict()

    np.savez(args.out, **fold_state_dict(sd, args.variant))
    print(f"wrote {args.out} (variant={args.variant})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
