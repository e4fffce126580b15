"""Convert an InceptionV3 torch checkpoint to the flax npz used by
pdm_tpu.utils.fid (offline weight-porting utility).

For FID parity with the reference (torchmetrics / pytorch-fid), convert
the FID-standard weights file ``pt_inception-2015-12-05-*.pth`` — the
network built by pdm_tpu.models.inception defaults to that variant's
pooling semantics (fid_variant=True). Plain torchvision inception_v3
weights also convert (same parameter names) but correspond to
fid_variant=False and produce features NOT comparable to reference FID
numbers."""
import argparse

from _common import setup_jax


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("torch_checkpoint", help=".pth state_dict path")
    parser.add_argument("--out", default="checkpoints/inception_fid.npz")
    args = parser.parse_args()

    import numpy as np
    import torch

    from pdm_tpu.models.inception import convert_torch_state_dict, save_inception

    sd = torch.load(args.torch_checkpoint, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params = convert_torch_state_dict(sd)
    save_inception(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
