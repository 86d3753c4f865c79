"""Export an .npz checkpoint as a reference-format PyTorch checkpoint.

    python -m fullsubnet_plus_tpu.cli.export_torch \
        -M checkpoints/best_model.npz -O best_model.tar [--model fullsubnet_plus]

The output loads into the reference implementation (RookieJunChen/
FullSubNet-plus) with `load_state_dict(strict=True)` — its inferencer
(`speech_enhance/tools/inference.py`) can serve a model trained here with
no changes. `.tar` writes the reference trainer's artifact dict
({"epoch", "model"} — base_trainer.py:161-190); `.pth` writes the bare
state_dict. Inverse of the `.tar`→`.npz` ingestion the enhance CLI does.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("-M", "--checkpoint", required=True,
                        help="our .npz checkpoint (full state or weights-only)")
    parser.add_argument("-O", "--output", required=True,
                        help="output path (.tar for the full artifact, .pth for bare weights)")
    parser.add_argument("--model", default="fullsubnet_plus",
                        choices=["fullsubnet_plus", "fullsubnet"],
                        help="which reference module tree to target")
    args = parser.parse_args(argv)

    from fullsubnet_plus_tpu.io.checkpoint import (
        load_flat,
        nested_from_flat,
        save_torch_checkpoint,
    )

    flat, meta = load_flat(args.checkpoint)
    params = nested_from_flat(
        {k.removeprefix("params/"): v for k, v in flat.items() if k.startswith("params/")}
    )
    if not params:  # weights-only file saved with bare param paths
        params = nested_from_flat(flat)
    epoch = int(meta.get("epoch", 0)) if meta else 0
    save_torch_checkpoint(args.output, params, model_name=args.model, epoch=epoch)
    print(f"wrote {args.output} (epoch {epoch}, model {args.model})")


if __name__ == "__main__":
    main()
