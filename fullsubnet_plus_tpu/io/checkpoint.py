"""Checkpoint save/resume with the reference's artifact scheme.

Mirrors BaseTrainer's checkpoint contract (base_trainer.py:111-200):
  * `latest_model.npz`   — full train state {epoch, best_score, params,
    opt_state, step} saved every `save_checkpoint_interval` epochs
  * `model_NNNN.npz`     — per-epoch weights-only snapshot
  * `best_model.npz`     — written when the validation score improves
  * resume restores epoch/best/optimizer/params (`-R`); preload loads
    weights only (`-P`, strict=False semantics).

Storage is a flat .npz keyed by jax tree paths plus a JSON header. Leaves
are restored *into a template state's treedef*, so optax's namedtuple opt
states round-trip exactly. Rank-0-only writes (params are replicated across
hosts, so rank 0's copy is authoritative — same as the reference).
`load_torch_checkpoint` ingests the released PyTorch `.tar`/`.pth` files.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import numpy as np
from jax.tree_util import DictKey, FlattenedIndexKey, GetAttrKey, SequenceKey


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, DictKey):
            parts.append(str(p.key))
        elif isinstance(p, SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, FlattenedIndexKey):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def flatten_with_paths(tree) -> dict:
    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {_path_str(p): np.asarray(v) for p, v in leaves}


def save_pytree(path: str, tree, meta: dict | None = None) -> None:
    """Atomic save of a pytree (+ JSON metadata) to .npz."""
    payload = flatten_with_paths(tree)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp"
    )
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_flat(path: str):
    """Returns ({path: array}, meta)."""
    with np.load(path, allow_pickle=False) as data:
        flat, meta = {}, {}
        for key in data.files:
            if key == "__meta__":
                meta = json.loads(bytes(data[key]).decode())
            else:
                flat[key] = data[key]
    return flat, meta


def restore_like(template, flat: dict):
    """Rebuild `template`'s exact pytree structure from saved leaves.

    Missing paths keep the template's value (strict=False preload
    semantics); extra saved paths are ignored.
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = [flat.get(_path_str(p), v) for p, v in leaves]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def nested_from_flat(flat: dict):
    """Template-free rebuild into dicts/lists (params trees only)."""
    root: dict = {}
    for path, value in flat.items():
        node = root
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [rebuild(node[str(i)]) for i in range(len(keys))]
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


class CheckpointManager:
    """Reference-compatible experiment checkpoint layout."""

    def __init__(self, save_dir: str, is_primary: bool = True,
                 lr: float | None = None):
        self.save_dir = os.path.abspath(os.path.expanduser(save_dir))
        self.ckpt_dir = os.path.join(self.save_dir, "checkpoints")
        self.is_primary = is_primary
        # Recorded in every checkpoint's meta so a torch export
        # (cli.export_torch) can emit the run's real learning rate in the
        # Adam param_groups — torch restores hyperparams from there, and a
        # wrong lr would silently jump the resumed trajectory.
        self.lr = lr
        if is_primary:
            os.makedirs(self.ckpt_dir, exist_ok=True)

    def save(self, state, epoch: int, best_score: float, is_best: bool = False,
             latest_only: bool = False):
        """latest + per-epoch weights (+ best), rank 0 only
        (base_trainer.py:159-200). `latest_only` skips the per-epoch
        weights file — used by the preemption path, whose mid-epoch state
        is labeled with the previous epoch for -R replay and must not
        clobber that epoch's real end-of-epoch artifact."""
        if not self.is_primary:
            return
        meta = {"epoch": epoch, "best_score": float(best_score)}
        if self.lr is not None:
            meta["lr"] = float(self.lr)
        full = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        save_pytree(os.path.join(self.ckpt_dir, "latest_model.npz"), full, meta)
        if not latest_only:
            save_pytree(
                os.path.join(self.ckpt_dir, f"model_{epoch:04d}.npz"),
                {"params": state.params},
                meta,
            )
        if is_best:
            save_pytree(os.path.join(self.ckpt_dir, "best_model.npz"), full, meta)

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.ckpt_dir, "latest_model.npz"))

    def resume(self, state):
        """Restore the full train state. Returns (state, epoch, best_score)."""
        flat, meta = load_flat(os.path.join(self.ckpt_dir, "latest_model.npz"))
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        tree = restore_like(template, flat)
        state = type(state)(tree["params"], tree["opt_state"], tree["step"])
        return state, int(meta["epoch"]), float(meta["best_score"])

    def preload_params(self, path: str, template_params):
        """Weights-only preload (`-P`, strict=False: missing keys keep init)."""
        flat, _ = load_flat(path)
        # Stored either as {"params/..."} or bare param paths.
        stripped = {
            k.removeprefix("params/"): v for k, v in flat.items()
        }
        return restore_like(template_params, stripped)


def _is_plus(model_name: str) -> bool:
    return model_name in (
        "fullsubnet_plus",
        "fullsubnet_plus.model.fullsubnet_plus.FullSubNet_Plus",
    )


def _map_adam_states(opt_state, fn):
    """Rebuild an optax state tuple with every ScaleByAdamState mapped
    through `fn` (optax chains nest states in plain/named tuples)."""
    import optax

    if isinstance(opt_state, optax.ScaleByAdamState):
        return fn(opt_state)
    if isinstance(opt_state, tuple):
        mapped = [_map_adam_states(c, fn) for c in opt_state]
        if hasattr(opt_state, "_fields"):  # NamedTuple state
            return type(opt_state)(*mapped)
        return tuple(mapped)
    return opt_state


def find_adam_state(opt_state):
    """First ScaleByAdamState inside an optax chain state, or None."""
    import optax

    if isinstance(opt_state, optax.ScaleByAdamState):
        return opt_state
    if isinstance(opt_state, tuple):
        for c in opt_state:
            found = find_adam_state(c)
            if found is not None:
                return found
    return None


def load_torch_checkpoint(path: str, model_name: str = "fullsubnet_plus",
                          optimizer=None):
    """Load a reference .tar/.pth checkpoint and convert to our params.

    `.tar` checkpoints hold {"model": state_dict, ...} (base_trainer.py:168);
    `.pth` files hold the raw state_dict (base_trainer.py:192).

    With `optimizer` (the optax chain from make_optimizer) the FULL training
    state is imported — reference `_resume_checkpoint` semantics
    (base_trainer.py:128-157): returns (params, opt_state, meta) where
    opt_state carries the torch Adam exp_avg/exp_avg_sq/step converted into
    ScaleByAdamState (fresh init if the blob has no optimizer state) and
    meta = {"epoch", "best_score"} when present. Continuing a reference run
    here then continues the same Adam trajectory, not a restarted one.
    """
    import torch

    from fullsubnet_plus_tpu.io.torch_convert import (
        convert_adam_state,
        convert_fullsubnet,
        convert_fullsubnet_plus,
    )

    blob = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
    convert = convert_fullsubnet_plus if _is_plus(model_name) else convert_fullsubnet
    # Strip any DataParallel "module." prefix once, and convert the SAME
    # stripped dict the Adam key mapping below is built from (the converters
    # also strip internally, so this keeps the two paths consistent rather
    # than changing behavior).
    stripped = {k.removeprefix("module."): v for k, v in state_dict.items()}
    params = convert(stripped)
    if optimizer is None:
        return params

    import jax.numpy as jnp

    opt_state = optimizer.init(params)
    opt_sd = blob.get("optimizer") if isinstance(blob, dict) else None
    if opt_sd:
        converted = convert_adam_state(opt_sd, list(stripped.keys()), convert)
        if converted is not None:
            count, mu, nu = converted

            def set_state(adam):
                return type(adam)(
                    count=jnp.asarray(count, adam.count.dtype),
                    mu=jax.tree.map(
                        lambda t, v: jnp.asarray(v, t.dtype), adam.mu, mu
                    ),
                    nu=jax.tree.map(
                        lambda t, v: jnp.asarray(v, t.dtype), adam.nu, nu
                    ),
                )

            opt_state = _map_adam_states(opt_state, set_state)
    meta = {}
    if isinstance(blob, dict):
        if "epoch" in blob:
            meta["epoch"] = int(blob["epoch"])
        if "best_score" in blob:
            meta["best_score"] = float(blob["best_score"])
    return params, opt_state, meta


def save_torch_checkpoint(path: str, params, model_name: str = "fullsubnet_plus",
                          epoch: int = 0, opt_state=None, lr: float = 1e-3,
                          best_score: float = 0.0) -> None:
    """Export our params as a reference-format PyTorch checkpoint.

    `.tar` gets the reference's full artifact shape {"epoch", "best_score",
    "optimizer", "scaler", "model"} (base_trainer.py:159-190 of the
    reference); `.pth` gets the bare state_dict (base_trainer.py:192). The
    result loads into the reference's `FullSubNet_Plus`/`Model` with
    strict=True, so models trained here can be served by the reference
    implementation unchanged.

    With `opt_state` (our optax train state's opt_state) the embedded
    optimizer state_dict carries the real Adam moments, so the reference's
    `_resume_checkpoint` (base_trainer.py:128-157) continues OUR Adam
    trajectory; without it a fresh (empty-state) Adam state_dict is written.
    `lr` fills the exported param_group (torch restores hyperparams from it).
    """
    import torch

    from fullsubnet_plus_tpu.io.torch_convert import (
        export_adam_state,
        export_fullsubnet,
        export_fullsubnet_plus,
    )

    export = export_fullsubnet_plus if _is_plus(model_name) else export_fullsubnet
    sd = export(params)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    tmp = path + ".tmp"
    if path.endswith(".pth"):
        torch.save(tsd, tmp)
        os.replace(tmp, path)
        return

    adam = find_adam_state(opt_state) if opt_state is not None else None
    if adam is not None:
        opt_sd = export_adam_state(
            int(adam.count), adam.mu, adam.nu, export, lr=lr
        )
        opt_sd["state"] = {
            i: {
                "step": torch.tensor(float(s["step"])),
                "exp_avg": torch.from_numpy(np.ascontiguousarray(s["exp_avg"])),
                "exp_avg_sq": torch.from_numpy(
                    np.ascontiguousarray(s["exp_avg_sq"])
                ),
            }
            for i, s in opt_sd["state"].items()
        }
    else:
        opt_sd = {
            "state": {},
            "param_groups": [
                {
                    "lr": lr, "betas": [0.9, 0.999], "eps": 1e-8,
                    "weight_decay": 0.0, "amsgrad": False, "maximize": False,
                    "foreach": None, "capturable": False,
                    "differentiable": False, "fused": None,
                    "params": list(range(len(tsd))),
                }
            ],
        }
    # GradScaler defaults (torch.cuda.amp.GradScaler().state_dict()): the
    # reference resume does scaler.load_state_dict(checkpoint["scaler"]).
    scaler_sd = {
        "scale": 65536.0, "growth_factor": 2.0, "backoff_factor": 0.5,
        "growth_interval": 2000, "_growth_tracker": 0,
    }
    torch.save(
        {
            "epoch": epoch,
            "best_score": best_score,
            "optimizer": opt_sd,
            "scaler": scaler_sd,
            "model": tsd,
        },
        tmp,
    )
    os.replace(tmp, path)
