"""TOML config system, compatible with the reference's section shape.

The reference wires everything through TOML files whose sections name
components by dotted path with an `args` table (config/train.toml,
config/inference.toml; loader `initialize_module` at audio_zen/utils.py:63-99).
We parse the same files with stdlib tomllib and resolve the dotted paths
through our registries, so a user's existing reference config ports over
unchanged. `merge_config` reproduces the deep-merge helper
(audio_zen/utils.py:127-180).
"""

from __future__ import annotations

import copy
import os
import tomllib


def load_config(path: str) -> dict:
    with open(os.path.abspath(os.path.expanduser(path)), "rb") as f:
        return tomllib.load(f)


def merge_config(base: dict, override: dict) -> dict:
    """Recursive dict merge; override wins (audio_zen/utils.py:127-180)."""
    result = copy.deepcopy(base)
    for key, value in override.items():
        if key in result and isinstance(result[key], dict) and isinstance(value, dict):
            result[key] = merge_config(result[key], value)
        else:
            result[key] = copy.deepcopy(value)
    return result


def dump_config(config: dict, path: str) -> None:
    """Persist the resolved config beside the checkpoints
    (base_trainer.py:106-107). Minimal TOML writer (stdlib has no dumper)."""

    def fmt(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        if isinstance(v, (list, tuple)):
            return "[" + ", ".join(fmt(x) for x in v) + "]"
        return repr(v)

    lines = []

    def walk(table: dict, prefix: str):
        scalars = {k: v for k, v in table.items() if not isinstance(v, dict)}
        subtables = {k: v for k, v in table.items() if isinstance(v, dict)}
        if prefix and (scalars or not subtables):
            lines.append(f"[{prefix}]")
        for k, v in scalars.items():
            lines.append(f"{k} = {fmt(v)}")
        if scalars:
            lines.append("")
        for k, v in subtables.items():
            walk(v, f"{prefix}.{k}" if prefix else k)

    walk(config, "")
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
