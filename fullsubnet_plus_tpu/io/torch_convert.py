"""Convert PyTorch reference checkpoints to our parameter pytrees.

The released FullSubNet+ checkpoint (`best_model.tar`, README.md:6,56 of the
reference) stores a torch `state_dict` with cuDNN-layout LSTM weights
(`weight_ih_l{k} [4H, D]`, gate order i,f,g,o) and torch conv layouts
(`[O, I/g, K]`). Our layouts are documented in nn/lstm.py — conversion is
transposition plus key renaming; no numerics change.

Works on plain numpy arrays so it does not require torch at load time: pass
either a torch state_dict (tensors are `.numpy()`-ed) or a dict of numpy
arrays (e.g. loaded from a converted .npz).
"""

from __future__ import annotations

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def convert_linear(sd, prefix: str):
    """nn.Linear -> {weight [in, out], bias [out]}."""
    return {
        "weight": _np(sd[f"{prefix}.weight"]).T.copy(),
        "bias": _np(sd[f"{prefix}.bias"]).copy(),
    }


def convert_conv1d(sd, prefix: str):
    """nn.Conv1d -> {weight [O, I/g, K], bias [O]} (torch layout kept)."""
    return {
        "weight": _np(sd[f"{prefix}.weight"]).copy(),
        "bias": _np(sd[f"{prefix}.bias"]).copy(),
    }


def convert_lstm(sd, prefix: str, num_layers: int, suffix: str = ""):
    """nn.LSTM -> our {"layers": [{w_ih, w_hh, b_ih, b_hh}, ...]}.

    `suffix="_reverse"` picks up the backward direction of a
    bidirectional=True module (cuDNN key naming: `weight_ih_l{k}_reverse`).
    """
    layers = []
    for layer in range(num_layers):
        layers.append(
            {
                "w_ih": _np(sd[f"{prefix}.weight_ih_l{layer}{suffix}"]).T.copy(),
                "w_hh": _np(sd[f"{prefix}.weight_hh_l{layer}{suffix}"]).T.copy(),
                "b_ih": _np(sd[f"{prefix}.bias_ih_l{layer}{suffix}"]).copy(),
                "b_hh": _np(sd[f"{prefix}.bias_hh_l{layer}{suffix}"]).copy(),
            }
        )
    return {"layers": layers}


def convert_bilstm(sd, prefix: str, num_layers: int):
    """bidirectional nn.LSTM -> our {"fwd": ..., "bwd": ...} pair
    (nn/lstm.py bilstm_apply layout; matches sequence_model.py:20-45's
    bidirectional=True surface)."""
    return {
        "fwd": convert_lstm(sd, prefix, num_layers),
        "bwd": convert_lstm(sd, prefix, num_layers, suffix="_reverse"),
    }


def convert_gru(sd, prefix: str, num_layers: int):
    return convert_lstm(sd, prefix, num_layers)  # same tensor names/layout


def convert_bigru(sd, prefix: str, num_layers: int):
    """bidirectional nn.GRU -> our {"fwd": ..., "bwd": ...} pair (nn/lstm.py
    bigru_apply layout). cuDNN key naming and [3H, D] tensor layout match the
    LSTM's exactly (gate count differs only in the leading-dim size), so the
    LSTM converters apply unchanged."""
    return convert_bilstm(sd, prefix, num_layers)


def convert_group_norm(sd, prefix: str):
    return {
        "weight": _np(sd[f"{prefix}.weight"]).copy(),
        "bias": _np(sd[f"{prefix}.bias"]).copy(),
    }


def convert_tcn_block(sd, prefix: str):
    """Reference TCNBlock (causal_conv.py:67-94) -> nn/tcn.py param dict."""
    return {
        "conv1x1": convert_conv1d(sd, f"{prefix}.conv1x1"),
        "prelu1": _np(sd[f"{prefix}.prelu1.weight"]).copy(),
        "norm1": convert_group_norm(sd, f"{prefix}.norm1"),
        "depthwise": convert_conv1d(sd, f"{prefix}.depthwise_conv"),
        "prelu2": _np(sd[f"{prefix}.prelu2.weight"]).copy(),
        "norm2": convert_group_norm(sd, f"{prefix}.norm2"),
        "sconv": convert_conv1d(sd, f"{prefix}.sconv"),
    }


def convert_sequence_model(sd, prefix: str, sequence_model: str, num_layers: int = 2,
                           bidirectional: bool = False):
    """Reference SequenceModel (sequence_model.py:5-96) -> nn/sequence.py tree."""
    fc = convert_linear(sd, f"{prefix}.fc_output_layer")
    if sequence_model == "TCN":
        blocks = [convert_tcn_block(sd, f"{prefix}.sequence_model.{i}") for i in range(8)]
        return {"seq": {"blocks": blocks}, "fc_output_layer": fc}
    if sequence_model in ("LSTM", "GRU"):
        if bidirectional:
            conv = convert_bilstm if sequence_model == "LSTM" else convert_bigru
        else:
            conv = convert_lstm if sequence_model == "LSTM" else convert_gru
        return {"seq": conv(sd, f"{prefix}.sequence_model", num_layers), "fc_output_layer": fc}
    raise NotImplementedError(sequence_model)


def convert_tsse(sd, prefix: str):
    """Reference ChannelTimeSenseSELayer (attention_model.py:43-76)."""
    return {
        "small_conv": convert_conv1d(sd, f"{prefix}.smallConv1d.0"),
        "middle_conv": convert_conv1d(sd, f"{prefix}.middleConv1d.0"),
        "large_conv": convert_conv1d(sd, f"{prefix}.largeConv1d.0"),
        "feature_concate_fc": convert_linear(sd, f"{prefix}.feature_concate_fc"),
        "fc1": convert_linear(sd, f"{prefix}.fc1"),
        "fc2": convert_linear(sd, f"{prefix}.fc2"),
    }


def convert_se(sd, prefix: str):
    return {
        "fc1": convert_linear(sd, f"{prefix}.fc1"),
        "fc2": convert_linear(sd, f"{prefix}.fc2"),
    }


def convert_channel_attention(sd, prefix: str, model: str):
    if model == "TSSE":
        return convert_tsse(sd, prefix)
    if model in ("SE", "CBAM"):
        return convert_se(sd, prefix)
    if model == "ECA":
        weight = _np(sd[f"{prefix}.conv.weight"]).copy()  # bias=False in reference
        return {"conv": {"weight": weight}}  # k is the weight's static shape
    raise NotImplementedError(model)


def convert_fullsubnet_plus(state_dict, sb_sequence_model: str = "LSTM",
                            channel_attention_model: str = "TSSE"):
    """Full FullSubNet_Plus state_dict -> models/fullsubnet_plus.py param tree.

    Handles DDP's "module." prefix if present (base_trainer.py wraps in DDP).
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    return {
        "channel_attention": convert_channel_attention(sd, "channel_attention", channel_attention_model),
        "channel_attention_real": convert_channel_attention(sd, "channel_attention_real", channel_attention_model),
        "channel_attention_imag": convert_channel_attention(sd, "channel_attention_imag", channel_attention_model),
        "fb_model": convert_sequence_model(sd, "fb_model", "TCN"),
        "fb_model_real": convert_sequence_model(sd, "fb_model_real", "TCN"),
        "fb_model_imag": convert_sequence_model(sd, "fb_model_imag", "TCN"),
        "sb_model": convert_sequence_model(sd, "sb_model", sb_sequence_model, num_layers=2),
    }


def convert_fullsubnet(state_dict, sequence_model: str = "LSTM"):
    """FullSubNet baseline state_dict -> models/fullsubnet.py param tree."""
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    return {
        "fb_model": convert_sequence_model(sd, "fb_model", sequence_model, num_layers=2),
        "sb_model": convert_sequence_model(sd, "sb_model", sequence_model, num_layers=2),
    }


# ---------------------------------------------------------------------------
# Reverse direction: our param pytrees -> reference-layout torch state_dicts.
#
# Exact inverses of the converters above (transposes undone, key names mapped
# back to the reference's module attribute names), so a model trained here can
# be loaded by the reference implementation with `load_state_dict(strict=True)`
# (module names per fullsubnet_plus/model/fullsubnet_plus.py:72-110 and
# audio_zen/model/module/sequence_model.py:5-96 of the reference). Output
# values are numpy float32 arrays; wrap in torch tensors to `torch.save`.
# ---------------------------------------------------------------------------


def _f32(a) -> np.ndarray:
    # np.array always copies -> writable, torch.from_numpy-safe
    return np.array(a, dtype=np.float32, order="C")


def export_linear(out, params, prefix: str):
    out[f"{prefix}.weight"] = _f32(params["weight"]).T.copy()
    out[f"{prefix}.bias"] = _f32(params["bias"])


def export_conv1d(out, params, prefix: str):
    out[f"{prefix}.weight"] = _f32(params["weight"])
    if "bias" in params:
        out[f"{prefix}.bias"] = _f32(params["bias"])


def _export_lstm_layer(out, p, prefix: str, layer: int, suffix: str):
    out[f"{prefix}.weight_ih_l{layer}{suffix}"] = _f32(p["w_ih"]).T.copy()
    out[f"{prefix}.weight_hh_l{layer}{suffix}"] = _f32(p["w_hh"]).T.copy()
    out[f"{prefix}.bias_ih_l{layer}{suffix}"] = _f32(p["b_ih"])
    out[f"{prefix}.bias_hh_l{layer}{suffix}"] = _f32(p["b_hh"])


def export_lstm(out, params, prefix: str):
    # Key INSERTION order mirrors torch's parameter registration order
    # (flat-weights: per layer, forward then `_reverse`) so the exported
    # state_dict's key sequence doubles as the `model.parameters()` index
    # order that Adam state_dicts are keyed by (export_adam_state below).
    if "fwd" in params:  # bidirectional pair -> cuDNN `_reverse` key naming
        for layer in range(len(params["fwd"]["layers"])):
            _export_lstm_layer(out, params["fwd"]["layers"][layer], prefix, layer, "")
            _export_lstm_layer(out, params["bwd"]["layers"][layer], prefix, layer, "_reverse")
        return
    for layer, p in enumerate(params["layers"]):
        _export_lstm_layer(out, p, prefix, layer, "")


def export_group_norm(out, params, prefix: str):
    out[f"{prefix}.weight"] = _f32(params["weight"])
    out[f"{prefix}.bias"] = _f32(params["bias"])


def export_tcn_block(out, params, prefix: str):
    export_conv1d(out, params["conv1x1"], f"{prefix}.conv1x1")
    out[f"{prefix}.prelu1.weight"] = _f32(params["prelu1"])
    export_group_norm(out, params["norm1"], f"{prefix}.norm1")
    export_conv1d(out, params["depthwise"], f"{prefix}.depthwise_conv")
    out[f"{prefix}.prelu2.weight"] = _f32(params["prelu2"])
    export_group_norm(out, params["norm2"], f"{prefix}.norm2")
    export_conv1d(out, params["sconv"], f"{prefix}.sconv")


def export_sequence_model(out, params, prefix: str, sequence_model: str):
    # sequence_model before fc_output_layer: the reference registers them in
    # that order (sequence_model.py:30-76), and Adam-state export relies on
    # insertion order == `model.parameters()` order (export_adam_state).
    if sequence_model == "TCN":
        for i, block in enumerate(params["seq"]["blocks"]):
            export_tcn_block(out, block, f"{prefix}.sequence_model.{i}")
    elif sequence_model in ("LSTM", "GRU"):
        export_lstm(out, params["seq"], f"{prefix}.sequence_model")
    else:
        raise NotImplementedError(sequence_model)
    export_linear(out, params["fc_output_layer"], f"{prefix}.fc_output_layer")


def export_tsse(out, params, prefix: str):
    export_conv1d(out, params["small_conv"], f"{prefix}.smallConv1d.0")
    export_conv1d(out, params["middle_conv"], f"{prefix}.middleConv1d.0")
    export_conv1d(out, params["large_conv"], f"{prefix}.largeConv1d.0")
    export_linear(out, params["feature_concate_fc"], f"{prefix}.feature_concate_fc")
    export_linear(out, params["fc1"], f"{prefix}.fc1")
    export_linear(out, params["fc2"], f"{prefix}.fc2")


def export_channel_attention(out, params, prefix: str, model: str):
    if model == "TSSE":
        export_tsse(out, params, prefix)
    elif model in ("SE", "CBAM"):
        export_linear(out, params["fc1"], f"{prefix}.fc1")
        export_linear(out, params["fc2"], f"{prefix}.fc2")
    elif model == "ECA":
        out[f"{prefix}.conv.weight"] = _f32(params["conv"]["weight"])
    else:
        raise NotImplementedError(model)


def export_fullsubnet_plus(params, sb_sequence_model: str = "LSTM",
                           channel_attention_model: str = "TSSE"):
    """models/fullsubnet_plus.py param tree -> reference torch state_dict.

    Inverse of `convert_fullsubnet_plus`: loading the result into the
    reference `FullSubNet_Plus` (strict=True) reproduces our forward.
    """
    out = {}
    export_channel_attention(out, params["channel_attention"], "channel_attention",
                             channel_attention_model)
    export_channel_attention(out, params["channel_attention_real"],
                             "channel_attention_real", channel_attention_model)
    export_channel_attention(out, params["channel_attention_imag"],
                             "channel_attention_imag", channel_attention_model)
    export_sequence_model(out, params["fb_model"], "fb_model", "TCN")
    export_sequence_model(out, params["fb_model_real"], "fb_model_real", "TCN")
    export_sequence_model(out, params["fb_model_imag"], "fb_model_imag", "TCN")
    export_sequence_model(out, params["sb_model"], "sb_model", sb_sequence_model)
    return out


def export_fullsubnet(params, sequence_model: str = "LSTM"):
    """models/fullsubnet.py param tree -> reference torch state_dict."""
    out = {}
    export_sequence_model(out, params["fb_model"], "fb_model", sequence_model)
    export_sequence_model(out, params["sb_model"], "sb_model", sequence_model)
    return out


# ---------------------------------------------------------------------------
# Adam optimizer-state interop (both directions).
#
# Reference checkpoints carry `optimizer.state_dict()` (base_trainer.py:
# 159-192 of the reference): Adam moments keyed by parameter INDEX in
# `model.parameters()` order. These models register no buffers, so that
# order equals the model state_dict's key order — we zip the two and reuse
# the SAME layout converters as for the weights: Adam moments are
# elementwise state shaped exactly like their parameter, so the weight
# transposes apply to them unchanged and the numerics are untouched.
# ---------------------------------------------------------------------------


def _step_int(step) -> int:
    return int(step.item()) if hasattr(step, "item") else int(step)


def convert_adam_state(optimizer_sd, model_keys, convert_fn):
    """torch Adam `optimizer.state_dict()` -> (count, mu_tree, nu_tree).

    `model_keys`: the model state_dict's keys in order (== parameters()
    order). `convert_fn`: the weight converter for this model family
    (e.g. convert_fullsubnet_plus) — applied to the exp_avg / exp_avg_sq
    "state_dicts" to produce moment trees in our param-tree layout.
    Returns None if the optimizer has taken no steps yet (empty state).
    """
    state = optimizer_sd.get("state") or {}
    if not state:
        return None
    indices = [i for g in optimizer_sd["param_groups"] for i in g["params"]]
    if len(indices) != len(model_keys):
        raise ValueError(
            f"optimizer has {len(indices)} params, model has {len(model_keys)}"
        )
    mu_sd, nu_sd, counts = {}, {}, set()
    for key, idx in zip(model_keys, indices):
        s = state[idx]
        mu_sd[key] = _np(s["exp_avg"])
        nu_sd[key] = _np(s["exp_avg_sq"])
        counts.add(_step_int(s["step"]))
    if len(counts) != 1:
        raise ValueError(f"per-param Adam step counts differ: {sorted(counts)}")
    return counts.pop(), convert_fn(mu_sd), convert_fn(nu_sd)


def export_adam_state(count, mu_params, nu_params, export_fn, *, lr=1e-3,
                      betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    """(count, mu_tree, nu_tree) -> torch Adam `optimizer.state_dict()`.

    `export_fn`: the weight exporter (e.g. export_fullsubnet_plus). Its key
    insertion order mirrors the reference's registration order (see
    export_sequence_model), so enumerating its output keys reproduces the
    `model.parameters()` indices torch keys the state by. Values are numpy;
    wrap in torch tensors before `torch.save` (save_torch_checkpoint does).
    """
    mu_sd, nu_sd = export_fn(mu_params), export_fn(nu_params)
    state = {}
    for i, key in enumerate(mu_sd):
        state[i] = {
            "step": float(count),
            "exp_avg": mu_sd[key],
            "exp_avg_sq": nu_sd[key],
        }
    return {
        "state": state,
        "param_groups": [
            {
                "lr": lr,
                "betas": list(betas),
                "eps": eps,
                "weight_decay": weight_decay,
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "differentiable": False,
                "fused": None,
                "params": list(range(len(mu_sd))),
            }
        ],
    }
