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

    def __init__(self, save_dir: str, is_primary: bool = True):
        self.save_dir = os.path.abspath(os.path.expanduser(save_dir))
        self.ckpt_dir = os.path.join(self.save_dir, "checkpoints")
        self.is_primary = is_primary
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


def load_torch_checkpoint(path: str, model_name: str = "fullsubnet_plus"):
    """Load a reference .tar/.pth checkpoint and convert to our params.

    `.tar` checkpoints hold {"model": state_dict, ...} (base_trainer.py:168);
    `.pth` files hold the raw state_dict (base_trainer.py:192).
    """
    import torch

    from fullsubnet_plus_tpu.io.torch_convert import (
        convert_fullsubnet,
        convert_fullsubnet_plus,
    )

    blob = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
    if model_name in (
        "fullsubnet_plus",
        "fullsubnet_plus.model.fullsubnet_plus.FullSubNet_Plus",
    ):
        return convert_fullsubnet_plus(state_dict)
    return convert_fullsubnet(state_dict)


def save_torch_checkpoint(path: str, params, model_name: str = "fullsubnet_plus",
                          epoch: int = 0) -> None:
    """Export our params as a reference-format PyTorch checkpoint.

    `.tar` gets the reference's full artifact shape {"epoch", "model", ...}
    (base_trainer.py:161-190 of the reference); `.pth` gets the bare
    state_dict (base_trainer.py:192). The result loads into the reference's
    `FullSubNet_Plus`/`Model` with strict=True, so models trained here can be
    served by the reference implementation unchanged.
    """
    import torch

    from fullsubnet_plus_tpu.io.torch_convert import (
        export_fullsubnet,
        export_fullsubnet_plus,
    )

    if model_name in (
        "fullsubnet_plus",
        "fullsubnet_plus.model.fullsubnet_plus.FullSubNet_Plus",
    ):
        sd = export_fullsubnet_plus(params)
    else:
        sd = export_fullsubnet(params)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    tmp = path + ".tmp"
    if path.endswith(".pth"):
        torch.save(sd, tmp)
    else:
        torch.save({"epoch": epoch, "model": sd}, tmp)
    os.replace(tmp, path)
