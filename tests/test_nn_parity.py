"""Module-level parity vs torch: LSTM/GRU, TCN block, MulCA attention,
GroupNorm/PReLU, SequenceModel — golden activations from torch modules with
weights converted through io/torch_convert (SURVEY.md §4 test pyramid #2).
"""

import numpy as np
import torch
import torch.nn as nn

from fullsubnet_plus_tpu.io import torch_convert as tc
from fullsubnet_plus_tpu.nn import lstm as jlstm
from fullsubnet_plus_tpu.nn import tcn as jtcn
from fullsubnet_plus_tpu.nn import attention as jatt
from fullsubnet_plus_tpu.nn import sequence as jseq

torch.manual_seed(0)


def test_lstm_matches_torch(rng):
    m = nn.LSTM(input_size=34, hidden_size=48, num_layers=2, batch_first=True)
    x = rng.standard_normal((6, 20, 34)).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(x))
    sd = {f"x.{k}": v for k, v in m.state_dict().items()}
    params = tc.convert_lstm(sd, "x", 2)
    ours, _ = jlstm.lstm_apply(params, x)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-4)


def test_gru_matches_torch(rng):
    m = nn.GRU(input_size=20, hidden_size=32, num_layers=2, batch_first=True)
    x = rng.standard_normal((4, 15, 20)).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(x))
    sd = {f"x.{k}": v for k, v in m.state_dict().items()}
    params = tc.convert_gru(sd, "x", 2)
    ours, _ = jlstm.gru_apply(params, x)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-4)


class TorchTCNBlock(nn.Module):
    """Reference TCNBlock re-created from its published equation
    (causal_conv.py:67-117) for golden-activation comparison."""

    def __init__(self, in_channels=64, hidden_channel=96, kernel_size=3, dilation=2):
        super().__init__()
        self.conv1x1 = nn.Conv1d(in_channels, hidden_channel, 1)
        self.prelu1 = nn.PReLU()
        self.norm1 = nn.GroupNorm(1, hidden_channel, eps=1e-8)
        padding = (dilation * (kernel_size - 1)) // 2
        self.depthwise_conv = nn.Conv1d(
            hidden_channel, hidden_channel, kernel_size, groups=hidden_channel,
            padding=padding, dilation=dilation,
        )
        self.prelu2 = nn.PReLU()
        self.norm2 = nn.GroupNorm(1, hidden_channel, eps=1e-8)
        self.sconv = nn.Conv1d(hidden_channel, in_channels, 1)

    def forward(self, x):
        y = self.conv1x1(x)
        y = self.norm1(self.prelu1(y))
        y = self.depthwise_conv(y)
        y = self.norm2(self.prelu2(y))
        return x + self.sconv(y)


def test_tcn_block_matches_torch(rng):
    m = TorchTCNBlock()
    x = rng.standard_normal((2, 64, 30)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    sd = {f"b.{k}".replace("b.depthwise_conv", "b.depthwise_conv"): v for k, v in m.state_dict().items()}
    params = tc.convert_tcn_block(sd, "b")
    ours = np.asarray(jtcn.tcn_block_apply(params, x, dilation=2))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


class TorchTSSE(nn.Module):
    """ChannelTimeSenseSELayer re-created (attention_model.py:43-98)."""

    def __init__(self, num_channels=64, reduction_ratio=2, kersize=(3, 5, 10),
                 subband_num=1):
        super().__init__()
        reduced = num_channels // reduction_ratio
        mk = lambda k: nn.Sequential(
            nn.Conv1d(num_channels, num_channels, kernel_size=k,
                      groups=num_channels // subband_num),
            nn.AdaptiveAvgPool1d(1),
            nn.ReLU(inplace=True),
        )
        self.smallConv1d = mk(kersize[0])
        self.middleConv1d = mk(kersize[1])
        self.largeConv1d = mk(kersize[2])
        self.feature_concate_fc = nn.Linear(3, 1, bias=True)
        self.fc1 = nn.Linear(num_channels, reduced, bias=True)
        self.fc2 = nn.Linear(reduced, num_channels, bias=True)

    def forward(self, x):
        feats = torch.cat(
            [self.smallConv1d(x), self.middleConv1d(x), self.largeConv1d(x)], dim=2
        )
        squeeze = self.feature_concate_fc(feats)[..., 0]
        gate = torch.sigmoid(self.fc2(torch.relu(self.fc1(squeeze))))
        return x * gate[:, :, None]


def test_tsse_matches_torch(rng):
    m = TorchTSSE()
    x = rng.standard_normal((3, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    sd = {f"a.{k}": v for k, v in m.state_dict().items()}
    params = tc.convert_tsse(sd, "a")
    ours = np.asarray(jatt.tsse_apply(params, x))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_tsse_grouped_subband_matches_torch(rng):
    """The attention layer's OWN subband_num surface (attention_model.py:49,
    58: conv groups = num_channels // subband_num). NOTE the reference
    FullSubNet_Plus never forwards subband_num here (fullsubnet_plus.py:
    52-70) — this pins the standalone-layer surface, selectable when the
    layer is constructed directly from a config dotted path."""
    m = TorchTSSE(num_channels=64, subband_num=2)
    x = rng.standard_normal((3, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    sd = {f"a.{k}": v for k, v in m.state_dict().items()}
    params = tc.convert_tsse(sd, "a")
    assert params["small_conv"]["weight"].shape == (64, 2, 3)  # grouped, not depthwise
    ours = np.asarray(jatt.tsse_apply(params, x, subband_num=2))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_se_eca_cbam_run(rng):
    import jax

    x = rng.standard_normal((2, 32, 20)).astype(np.float32)
    for model in ("SE", "ECA", "CBAM"):
        params = jatt.channel_attention_init(jax.random.PRNGKey(0), model, 32)
        out = np.asarray(jatt.channel_attention_apply(params, model, x))
        assert out.shape == x.shape
        assert np.isfinite(out).all()


def test_se_eca_cbam_torch_parity(rng):
    """Converter + apply parity for the alternative channel-attention
    variants against the ACTUAL reference classes (attention_model.py:6-40,
    296-332, 335-359) — round-1 only smoke-tested these."""
    import sys
    import types

    sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    for p in ("/root/reference/speech_enhance", "/root/reference"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from audio_zen.model.module.attention_model import (
        ChannelCBAMLayer,
        ChannelECAlayer,
        ChannelSELayer,
    )

    x = rng.standard_normal((3, 32, 25)).astype(np.float32)
    torch.manual_seed(4)
    refs = {
        "SE": ChannelSELayer(32),
        "CBAM": ChannelCBAMLayer(32),
        "ECA": ChannelECAlayer(32),
    }
    for name, mod in refs.items():
        mod.eval()
        with torch.no_grad():
            want = mod(torch.from_numpy(x)).numpy()
        sd = {f"a.{k}": v for k, v in mod.state_dict().items()}
        params = tc.convert_channel_attention(sd, "a", name)
        ours = np.asarray(jatt.channel_attention_apply(params, name, x))
        np.testing.assert_allclose(ours, want, atol=1e-5, rtol=1e-4,
                                   err_msg=name)


def test_sequence_model_lstm_matches_torch(rng):
    """Full SequenceModel: LSTM + Linear + no activation (sb_model config)."""
    lstm = nn.LSTM(input_size=34, hidden_size=48, num_layers=2, batch_first=True)
    fc = nn.Linear(48, 2)
    x = rng.standard_normal((5, 34, 25)).astype(np.float32)
    with torch.no_grad():
        o, _ = lstm(torch.from_numpy(x).permute(0, 2, 1))
        ref = fc(o).permute(0, 2, 1).numpy()
    sd = {f"m.sequence_model.{k}": v for k, v in lstm.state_dict().items()}
    sd.update({f"m.fc_output_layer.{k}": v for k, v in fc.state_dict().items()})
    params = tc.convert_sequence_model(sd, "m", "LSTM", num_layers=2)
    ours = np.asarray(
        jseq.sequence_model_apply(
            params, x, sequence_model="LSTM", output_activate_function=False
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_sequence_model_tcn_shape(rng):
    import jax

    params = jseq.sequence_model_init(
        jax.random.PRNGKey(0), 64, 64, 512, 2, False, "TCN"
    )
    x = rng.standard_normal((2, 64, 30)).astype(np.float32)
    out = np.asarray(
        jseq.sequence_model_apply(
            params, x, sequence_model="TCN", output_activate_function="ReLU"
        )
    )
    assert out.shape == (2, 64, 30)
    assert (out >= 0).all()

def test_bilstm_matches_torch(rng):
    """Bidirectional stacked LSTM: torch feeds layers >= 1 the 2H concat of
    both directions (regression: lstm_init sized layer-1+ inputs at H, so
    any bidirectional num_layers >= 2 model crashed on the first apply)."""
    m = nn.LSTM(input_size=20, hidden_size=24, num_layers=2, batch_first=True,
                bidirectional=True)
    x = rng.standard_normal((3, 12, 20)).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(x))
    sd = m.state_dict()

    def direction(sfx):
        return {
            "layers": [
                {
                    "w_ih": sd[f"weight_ih_l{l}{sfx}"].numpy().T.copy(),
                    "w_hh": sd[f"weight_hh_l{l}{sfx}"].numpy().T.copy(),
                    "b_ih": sd[f"bias_ih_l{l}{sfx}"].numpy().copy(),
                    "b_hh": sd[f"bias_hh_l{l}{sfx}"].numpy().copy(),
                }
                for l in range(2)
            ]
        }

    ours = jlstm.bilstm_apply(direction(""), direction("_reverse"), x)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-4)


def test_sequence_model_bidirectional_converter_matches_torch(rng):
    """convert_sequence_model(bidirectional=True) end-to-end vs torch's
    SequenceModel surface (sequence_model.py:20-45: bidirectional LSTM ->
    Linear(2H, O)), plus the export round-trip back to cuDNN `_reverse`
    keys (VERDICT r2 missing #6)."""
    lstm = nn.LSTM(input_size=20, hidden_size=24, num_layers=2,
                   batch_first=True, bidirectional=True)
    fc = nn.Linear(48, 2)
    x = rng.standard_normal((3, 20, 12)).astype(np.float32)
    with torch.no_grad():
        o, _ = lstm(torch.from_numpy(x).permute(0, 2, 1))
        ref = fc(o).permute(0, 2, 1).numpy()
    sd = {f"m.sequence_model.{k}": v for k, v in lstm.state_dict().items()}
    sd.update({f"m.fc_output_layer.{k}": v for k, v in fc.state_dict().items()})
    params = tc.convert_sequence_model(sd, "m", "LSTM", num_layers=2,
                                       bidirectional=True)
    ours = np.asarray(
        jseq.sequence_model_apply(
            params, x, sequence_model="LSTM", bidirectional=True,
            output_activate_function=False,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)

    # Export round-trip: our tree -> torch state_dict keys -> same values.
    out = {}
    tc.export_sequence_model(out, params, "m", "LSTM")
    for k, v in sd.items():
        np.testing.assert_allclose(out[k], v.numpy(), atol=0, rtol=0,
                                   err_msg=k)


def test_sequence_model_bidirectional_gru_matches_torch(rng):
    """convert_sequence_model("GRU", bidirectional=True) end-to-end vs the
    torch SequenceModel surface (sequence_model.py:20-45 of the reference:
    bidirectional GRU -> Linear(2H, O)), plus the export round-trip — closes
    the last reference-surface NotImplementedError (VERDICT r3 missing #4)."""
    gru = nn.GRU(input_size=20, hidden_size=24, num_layers=2,
                 batch_first=True, bidirectional=True)
    fc = nn.Linear(48, 2)
    x = rng.standard_normal((3, 20, 12)).astype(np.float32)
    with torch.no_grad():
        o, _ = gru(torch.from_numpy(x).permute(0, 2, 1))
        ref = fc(o).permute(0, 2, 1).numpy()
    sd = {f"m.sequence_model.{k}": v for k, v in gru.state_dict().items()}
    sd.update({f"m.fc_output_layer.{k}": v for k, v in fc.state_dict().items()})
    params = tc.convert_sequence_model(sd, "m", "GRU", num_layers=2,
                                       bidirectional=True)
    ours = np.asarray(
        jseq.sequence_model_apply(
            params, x, sequence_model="GRU", bidirectional=True,
            output_activate_function=False,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)

    # Export round-trip: our tree -> torch state_dict keys -> same values.
    out = {}
    tc.export_sequence_model(out, params, "m", "GRU")
    for k, v in sd.items():
        np.testing.assert_allclose(out[k], v.numpy(), atol=0, rtol=0,
                                   err_msg=k)


def test_sequence_model_bidirectional_gru_init_applies(rng):
    """init/apply shape agreement for the bidirectional-GRU config surface."""
    import jax

    params = jseq.sequence_model_init(
        jax.random.PRNGKey(0), input_size=16, output_size=2, hidden_size=24,
        num_layers=2, bidirectional=True, sequence_model="GRU",
    )
    x = rng.standard_normal((2, 16, 10)).astype(np.float32)
    out = jseq.sequence_model_apply(
        params, x, sequence_model="GRU", bidirectional=True,
        output_activate_function=False,
    )
    assert out.shape == (2, 2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_sequence_model_bidirectional_init_applies(rng):
    """init/apply shape agreement for the bidirectional config surface."""
    import jax

    params = jseq.sequence_model_init(
        jax.random.PRNGKey(0), input_size=16, output_size=2, hidden_size=24,
        num_layers=2, bidirectional=True, sequence_model="LSTM",
    )
    x = rng.standard_normal((2, 16, 10)).astype(np.float32)
    out = jseq.sequence_model_apply(
        params, x, sequence_model="LSTM", bidirectional=True,
        output_activate_function=False,
    )
    assert out.shape == (2, 2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_eca_params_cast_and_grad(rng):
    """ECA params must be a clean pytree of arrays: serving casts them with
    tree_map and training differentiates them (regression: a Python int
    k_size leaf broke both; k now comes from the conv weight's shape)."""
    import jax
    import jax.numpy as jnp

    x = rng.standard_normal((2, 32, 20)).astype(np.float32)
    params = jatt.eca_init(jax.random.PRNGKey(0), 32)
    bf16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    out = jatt.eca_apply(bf16, jnp.asarray(x).astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16

    grads = jax.grad(lambda p: jatt.eca_apply(p, jnp.asarray(x)).sum())(params)
    assert np.isfinite(np.asarray(grads["conv"]["weight"])).all()
