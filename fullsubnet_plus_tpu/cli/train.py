"""Training CLI (reference tools/train.py:86-121).

    python -m fullsubnet_plus_tpu.cli.train -C config/train.toml [-R] [-V]
        [-P ckpt] [--bf16] [--epochs N]

Differences from the reference launcher: no mp.spawn/GPUtil — the TPU runs
one process per host; intra-host chips are driven by a ('data','freq') mesh
inside the jitted step, and multi-host runs bootstrap with
`jax.distributed.initialize` (flags --coordinator/--num-hosts/--host-id).
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np


def build_trainer(config: dict, args) -> "Trainer":
    import jax

    from fullsubnet_plus_tpu.data.datasets import TrainDataset, ValidationDataset
    from fullsubnet_plus_tpu.data.loader import BatchLoader
    from fullsubnet_plus_tpu.models import get_model
    from fullsubnet_plus_tpu.parallel import initialize_distributed
    from fullsubnet_plus_tpu.parallel.mesh import auto_mesh
    from fullsubnet_plus_tpu.train.loss import get_loss
    from fullsubnet_plus_tpu.train.step import make_optimizer
    from fullsubnet_plus_tpu.train.trainer import Trainer
    from fullsubnet_plus_tpu.utils import logger
    from fullsubnet_plus_tpu.utils.config import dump_config

    initialize_distributed(args.coordinator, args.num_hosts, args.host_id)
    is_primary = jax.process_index() == 0

    seed = config.get("meta", {}).get("seed", 0)
    random.seed(seed)
    np.random.seed(seed)

    save_dir = os.path.join(
        config["meta"]["save_dir"], config["meta"].get("experiment_name", "")
    ).rstrip("/")
    if is_primary:
        os.makedirs(save_dir, exist_ok=True)
        logger.init(os.path.join(save_dir, "train.log"))
        dump_config(config, os.path.join(save_dir, "config.toml"))

    model_def = get_model(config["model"]["path"])
    model_config = model_def.make_config(config["model"]["args"])

    train_args = dict(config["train_dataset"]["args"])
    train_args.pop("num_workers", None)
    train_dataset = TrainDataset(
        **train_args,
        seed=seed,
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
    )
    dl_cfg = config["train_dataset"].get("dataloader", {})
    train_loader = BatchLoader(
        train_dataset,
        batch_size=dl_cfg.get("batch_size", 18),
        num_workers=dl_cfg.get("num_workers", 4),
        drop_last=dl_cfg.get("drop_last", True),
        seed=seed,
    )
    valid_dataset = None
    if "validation_dataset" in config:
        valid_dataset = ValidationDataset(**config["validation_dataset"]["args"])

    opt_cfg = config.get("optimizer", {})
    optimizer = make_optimizer(
        lr=opt_cfg.get("lr", 1e-3),
        beta1=opt_cfg.get("beta1", 0.9),
        beta2=opt_cfg.get("beta2", 0.999),
        clip_grad_norm=config.get("trainer", {})
        .get("train", {})
        .get("clip_grad_norm_value", 10.0),
    )

    mesh = auto_mesh(dl_cfg.get("batch_size", 18))
    trainer_cfg = config.get("trainer", {})
    trainer = Trainer(
        model_def,
        model_config,
        save_dir=save_dir,
        train_loader=train_loader,
        valid_dataset=valid_dataset,
        loss_fn=get_loss(config.get("loss_function", {}).get("name", "mse_loss")),
        optimizer=optimizer,
        acoustics=config.get("acoustics", {}),
        epochs=args.epochs or trainer_cfg.get("train", {}).get("epochs", 9999),
        save_checkpoint_interval=trainer_cfg.get("train", {}).get(
            "save_checkpoint_interval", 1
        ),
        validation_interval=trainer_cfg.get("validation", {}).get(
            "validation_interval", 1
        ),
        validation_metrics=trainer_cfg.get("visualization", {}).get(
            "metrics", ["STOI", "SI_SDR"]
        ),
        metric_workers=trainer_cfg.get("visualization", {}).get("num_workers", 4),
        save_max_metric_score=trainer_cfg.get("validation", {}).get(
            "save_max_metric_score", True
        ),
        # bucketed validation knobs (0 buckets the reference-shaped
        # per-utterance loop; see train/trainer.py _validation_epoch)
        valid_batch_size=trainer_cfg.get("validation", {}).get(
            "batch_size", 8
        ),
        valid_num_buckets=trainer_cfg.get("validation", {}).get(
            "num_buckets", 2
        ),
        lr=opt_cfg.get("lr", 1e-3),
        mesh=mesh,
        compute_dtype="bfloat16" if args.bf16 else None,
        remat=args.remat
        or trainer_cfg.get("train", {}).get("remat", False),
        seed=seed,
        is_primary=is_primary,
    )
    if args.resume:
        trainer.resume()
    if getattr(args, "from_torch", None):
        if args.resume:
            # -R wins: a resumed run (e.g. the supervisor's relaunch of a
            # --from-torch job) must continue from its own checkpoint, not
            # re-import the original torch state and lose the progress.
            logger.log(f"--from-torch {args.from_torch} ignored: -R resume "
                       "takes precedence")
        else:
            trainer.resume_from_torch(args.from_torch)
    if args.preloaded_model_path:
        trainer.preload(args.preloaded_model_path)
    return trainer


def main(argv=None):
    parser = argparse.ArgumentParser(description="FullSubNet+ TPU training")
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("-R", "--resume", action="store_true")
    parser.add_argument("-V", "--only_validation", action="store_true")
    parser.add_argument("-P", "--preloaded_model_path", default=None)
    parser.add_argument("--from-torch", default=None, metavar="CKPT.tar",
                        help="continue a reference PyTorch run: import "
                             "weights AND Adam moments/step/epoch from a "
                             "latest_model.tar / best_model.tar")
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint the model forward (activation "
                             "memory for FLOPs — larger per-chip batches)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-hosts", type=int, default=None)
    parser.add_argument("--host-id", type=int, default=None)
    parser.add_argument("--supervise", type=int, default=None, metavar="N",
                        help="run under the auto-recovery supervisor "
                             "(train/supervisor.py): relaunch with -R up to "
                             "N times on abnormal exit or heartbeat stall")
    parser.add_argument("--heartbeat-timeout", type=float, default=1800.0,
                        help="supervisor: seconds without a heartbeat before "
                             "the child is presumed wedged (remote compiles "
                             "are slow — keep this generous)")
    args = parser.parse_args(argv)

    from fullsubnet_plus_tpu.utils.config import load_config

    config = load_config(args.configuration)

    if args.supervise is not None:
        from fullsubnet_plus_tpu.train.supervisor import supervise

        save_dir = os.path.join(
            config["meta"]["save_dir"],
            config["meta"].get("experiment_name", ""),
        ).rstrip("/")
        raw = list(sys.argv[1:] if argv is None else argv)
        child_argv = []
        skip = False
        for a in raw:  # strip the supervisor's own flags from the child cmd
            if skip:
                skip = False
                continue
            if a in ("--supervise", "--heartbeat-timeout"):
                skip = True
                continue
            if a.startswith(("--supervise=", "--heartbeat-timeout=")):
                continue
            child_argv.append(a)
        raise SystemExit(supervise(
            child_argv, save_dir, max_restarts=args.supervise,
            heartbeat_timeout=args.heartbeat_timeout,
        ))

    from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    trainer = build_trainer(config, args)
    trainer.train(only_validation=args.only_validation)


if __name__ == "__main__":
    main()
