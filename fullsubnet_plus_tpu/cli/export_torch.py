"""Export an .npz checkpoint as a reference-format PyTorch checkpoint.

    python -m fullsubnet_plus_tpu.cli.export_torch \
        -M checkpoints/best_model.npz -O best_model.tar [--model fullsubnet_plus]

The output loads into the reference implementation (RookieJunChen/
FullSubNet-plus) with `load_state_dict(strict=True)` — its inferencer
(`speech_enhance/tools/inference.py`) can serve a model trained here with
no changes. `.tar` writes the reference trainer's full artifact dict
({"epoch", "best_score", "optimizer", "scaler", "model"} —
base_trainer.py:159-190), including the converted Adam moments when the
.npz holds the full train state, so the reference trainer can RESUME a run
trained here. `.pth` writes the bare state_dict. Inverse of the
`.tar`→`.npz` ingestion the enhance CLI does.
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
    parser.add_argument("--lr", type=float, default=None,
                        help="learning rate for the exported Adam "
                             "param_groups (torch restores hyperparams from "
                             "them on resume). Default: the lr recorded in "
                             "the checkpoint meta, else 1e-3 — pass this if "
                             "the .npz predates lr recording and the run "
                             "used a different lr")
    args = parser.parse_args(argv)

    from fullsubnet_plus_tpu.io.checkpoint import (
        load_flat,
        nested_from_flat,
        restore_like,
        save_torch_checkpoint,
    )

    flat, meta = load_flat(args.checkpoint)
    params = nested_from_flat(
        {k.removeprefix("params/"): v for k, v in flat.items() if k.startswith("params/")}
    )
    if not params:  # weights-only file saved with bare param paths
        params = nested_from_flat(flat)
    epoch = int(meta.get("epoch", 0)) if meta else 0
    opt_state = None
    if any(k.startswith("opt_state/") for k in flat):
        # Full train-state .npz: rebuild the optax state into a fresh
        # template so the exported .tar carries the Adam moments/step and
        # the reference's _resume_checkpoint continues OUR trajectory.
        from fullsubnet_plus_tpu.train.step import make_optimizer

        template = make_optimizer().init(params)
        opt_state = restore_like(
            template,
            {k.removeprefix("opt_state/"): v for k, v in flat.items()
             if k.startswith("opt_state/")},
        )
    lr = args.lr if args.lr is not None else float((meta or {}).get("lr", 1e-3))
    save_torch_checkpoint(
        args.output, params, model_name=args.model, epoch=epoch,
        opt_state=opt_state, lr=lr,
        best_score=float(meta.get("best_score", 0.0)) if meta else 0.0,
    )
    with_opt = (f"with Adam state, lr={lr}" if opt_state is not None
                else "weights-only")
    print(f"wrote {args.output} (epoch {epoch}, model {args.model}, {with_opt})")


if __name__ == "__main__":
    main()
