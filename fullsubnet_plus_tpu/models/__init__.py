"""Model registry: dotted-path names compatible with the reference TOMLs.

The reference wires components by dotted import path in TOML
(`initialize_module`, audio_zen/utils.py:63-99). We keep the same config
strings working by mapping them onto our (config_cls, init, apply) triples.
"""

from fullsubnet_plus_tpu.models import fullsubnet, fullsubnet_plus
from fullsubnet_plus_tpu.models.fullsubnet import FullSubNetConfig
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig


class ModelDef:
    """Bundles a model family's config dataclass and pure functions."""

    def __init__(self, name, config_cls, init_fn, apply_fn, n_inputs):
        self.name = name
        self.config_cls = config_cls
        self.init = init_fn
        self.apply = apply_fn
        self.n_inputs = n_inputs  # spectrogram views consumed (1 or 3)

    def make_config(self, args: dict):
        """Build the config dataclass from a reference-style TOML args table."""
        fields = self.config_cls.__dataclass_fields__
        kwargs = {}
        for k, v in args.items():
            if k in ("weight_init",):  # handled at init-time, not architecture
                continue
            if k in fields:
                kwargs[k] = tuple(v) if isinstance(v, list) else v
        return self.config_cls(**kwargs)


FULLSUBNET_PLUS = ModelDef(
    "fullsubnet_plus",
    FullSubNetPlusConfig,
    fullsubnet_plus.init,
    fullsubnet_plus.apply,
    n_inputs=3,
)
FULLSUBNET = ModelDef(
    "fullsubnet", FullSubNetConfig, fullsubnet.init, fullsubnet.apply, n_inputs=1
)

# Reference dotted paths (config/train.toml:74, inference.toml:27-28) plus
# our native short names.
MODEL_REGISTRY = {
    "fullsubnet_plus": FULLSUBNET_PLUS,
    "fullsubnet": FULLSUBNET,
    "fullsubnet_plus.model.fullsubnet_plus.FullSubNet_Plus": FULLSUBNET_PLUS,
    "fullsubnet.model.fullsubnet.Model": FULLSUBNET,
}


def get_model(name: str) -> ModelDef:
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]
