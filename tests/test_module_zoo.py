"""Coverage tests for the long tail of the reference module inventory:
attention variants, complex sequence model, causal 2-D convs, TCN-subband,
feature norms, multi-channel DSP, misc utils (SURVEY.md §2 completeness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fullsubnet_plus_tpu.nn import attention as jatt
from fullsubnet_plus_tpu.nn import sequence as jseq
from fullsubnet_plus_tpu.nn import tcn as jtcn
from fullsubnet_plus_tpu.nn import feature_norm as jfn
from fullsubnet_plus_tpu.dsp import multichannel as mc
from fullsubnet_plus_tpu.dsp.norms import sband_forgetting_norm


def test_attention_variants_run(rng):
    x = rng.standard_normal((2, 32, 40)).astype(np.float32)
    for model in ("DeepTSSE", "TSSE_ATT"):
        params = jatt.channel_attention_init(jax.random.PRNGKey(0), model, 32)
        out = np.asarray(jatt.channel_attention_apply(params, model, x))
        assert out.shape == x.shape and np.isfinite(out).all()
    params = jatt.tsse_weight_init(jax.random.PRNGKey(1), 32)
    gated, gate = jatt.tsse_weight_apply(params, x)
    assert gated.shape == x.shape and gate.shape == (2, 32, 1)
    np.testing.assert_allclose(np.asarray(gated), np.asarray(x * gate), atol=1e-6)


def test_complex_sequence_model_matches_torch(rng):
    """Cross-term structure vs a torch re-creation of Complex_SequenceModel
    (sequence_model.py:207-243)."""
    import torch.nn as nn

    torch.manual_seed(0)
    real_net = nn.LSTM(16, 24, 2, batch_first=True)
    imag_net = nn.LSTM(16, 24, 2, batch_first=True)
    real_fc = nn.Linear(24, 8)
    imag_fc = nn.Linear(24, 8)
    x = rng.standard_normal((2, 32, 20)).astype(np.float32)  # [B, 2F, T]

    with torch.no_grad():
        tr, ti = torch.chunk(torch.from_numpy(x), 2, 1)
        tr = tr.permute(0, 2, 1)
        ti = ti.permute(0, 2, 1)
        r2r = real_net(tr)[0]
        r2i = imag_net(tr)[0]
        i2r = real_net(ti)[0]
        i2i = imag_net(ti)[0]
        ro = real_fc(r2r - i2i).permute(0, 2, 1)
        io = imag_fc(i2r + r2i).permute(0, 2, 1)
        ref = torch.cat([ro, io], 1).numpy()

    from fullsubnet_plus_tpu.io.torch_convert import convert_lstm, convert_linear

    params = {
        "real_sequence_model": convert_lstm(
            {f"m.{k}": v for k, v in real_net.state_dict().items()}, "m", 2
        ),
        "imag_sequence_model": convert_lstm(
            {f"m.{k}": v for k, v in imag_net.state_dict().items()}, "m", 2
        ),
        "real_fc_output_layer": convert_linear(
            {f"m.{k}": v for k, v in real_fc.state_dict().items()}, "m"
        ),
        "imag_fc_output_layer": convert_linear(
            {f"m.{k}": v for k, v in imag_fc.state_dict().items()}, "m"
        ),
    }
    ours = np.asarray(
        jseq.complex_sequence_model_apply(params, x, sequence_model="LSTM")
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_causal_conv_blocks(rng):
    x = rng.standard_normal((2, 4, 32, 20)).astype(np.float32)
    params = jtcn.causal_conv_block_init(jax.random.PRNGKey(0), 4, 8)
    out = jtcn.causal_conv_block_apply(params, x, activation="ELU")
    assert out.shape == (2, 8, 15, 20)  # F halved by stride-2 conv, T kept
    tparams = jtcn.causal_trans_conv_block_init(jax.random.PRNGKey(1), 8, 4)
    back = jtcn.causal_trans_conv_block_apply(tparams, out)
    assert back.shape[1] == 4 and back.shape[3] == out.shape[3]
    assert np.isfinite(np.asarray(back)).all()


def test_causal_conv_matches_torch(rng):
    """CausalConvBlock (causal_conv.py:5-32) parity vs torch, eval BN."""
    import torch.nn as nn

    torch.manual_seed(0)
    conv = nn.Conv2d(3, 6, kernel_size=(3, 2), stride=(2, 1), padding=(0, 1))
    norm = nn.BatchNorm2d(6).eval()
    x = rng.standard_normal((2, 3, 16, 10)).astype(np.float32)
    with torch.no_grad():
        ref = torch.relu(norm(conv(torch.from_numpy(x))[:, :, :, :-1])).numpy()
    params = {
        "conv": {
            "weight": conv.weight.detach().numpy(),
            "bias": conv.bias.detach().numpy(),
        },
        "norm": {
            "weight": norm.weight.detach().numpy(),
            "bias": norm.bias.detach().numpy(),
            "running_mean": norm.running_mean.numpy(),
            "running_var": norm.running_var.numpy(),
        },
    }
    ours = np.asarray(
        jtcn.causal_conv_block_apply(params, x, activation="ReLU")
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_tcn_subband_variant(rng):
    params = jseq.sequence_model_init(
        jax.random.PRNGKey(0), 32, 32, 64, 2, False, "TCN-subband"
    )
    assert params["seq"]["blocks"][-1]["depthwise"]["weight"].shape[0] == 384
    assert params["seq"]["blocks"][0]["depthwise"]["weight"].shape[0] == 64
    x = rng.standard_normal((2, 32, 20)).astype(np.float32)
    out = jseq.sequence_model_apply(
        params, x, sequence_model="TCN-subband", output_activate_function="ReLU"
    )
    assert out.shape == (2, 32, 20)


def test_feature_norms(rng):
    x = np.abs(rng.standard_normal((2, 1, 64, 30))).astype(np.float32)
    t = torch.from_numpy(x)
    # offline variant: divide by global mean of per-frame means
    flat = t.reshape(2, 64, 30)
    mu = flat.mean(dim=1).mean(dim=-1).reshape(2, 1, 1)
    ref = (flat / (mu + 1e-6)).reshape(2, 1, 64, 30).numpy()
    ours = np.asarray(jfn.cumulative_mag_spectral_norm(x))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)
    for kwargs in (
        {"cumulative": True},
        {"use_mid_freq_mu": True},
        {"cumulative": True, "use_mid_freq_mu": True},
    ):
        out = np.asarray(jfn.cumulative_mag_spectral_norm(x, **kwargs))
        assert out.shape == x.shape and np.isfinite(out).all()
    out = np.asarray(jfn.cumulative_norm(x))
    assert out.shape == x.shape


def test_sband_forgetting_norm(rng):
    x = np.abs(rng.standard_normal((2, 64, 50))).astype(np.float32)
    out = np.asarray(sband_forgetting_norm(x, 20))
    assert out.shape == x.shape and np.isfinite(out).all()


def test_multichannel_dsp(rng):
    y = rng.standard_normal((2, 8, 8000)).astype(np.float32)
    spec = mc.mc_stft(jnp.asarray(y), 512, 256, 512)
    assert spec.shape == (2, 8, 257, 32)
    psd = mc.get_power_spectral_density_matrix(jnp.swapaxes(spec, 1, 2))
    assert psd.shape == (2, 257, 32, 8, 8)
    bf = jnp.ones((2, 257, 32, 8), jnp.complex64) / 8
    out = mc.apply_beamforming_vector(bf, jnp.swapaxes(spec, 1, 2))
    assert out.shape == (2, 257, 32)
    cfg = mc.DirectionalFeatureConfig()
    feats, mag, real, imag = mc.directional_features(jnp.asarray(y), cfg)
    assert feats.shape == (2, cfg.directional_feature_dim, 32)
    assert mag.shape == (2, 8, 257, 32)


def test_misc_utils(tmp_path):
    from fullsubnet_plus_tpu.utils.misc import (
        ExecutionTime,
        basename,
        check_nan,
        expand_path,
        prepare_empty_dir,
        initialize_module,
    )

    timer = ExecutionTime()
    assert timer.duration() >= 0
    assert basename("/a/b/c.wav") == ("c", ".wav")
    assert expand_path("~").startswith("/")
    assert not check_nan(np.ones(3))
    assert check_nan(np.array([np.nan]))
    prepare_empty_dir([str(tmp_path / "x")])
    assert (tmp_path / "x").is_dir()
    fn = initialize_module("fullsubnet_plus_tpu.train.loss.mse_loss", initialize=False)
    assert fn(jnp.ones(3), jnp.ones(3)) == 0


def test_plot_utils(tmp_path):
    from fullsubnet_plus_tpu.utils.plot import compare_two_runs, draw_hist

    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("mean: 1.0\n1.0\t/x/f1.wav\n2.0\t/x/f2.wav\n")
    b.write_text("mean: 1.5\n1.5\t/y/f1.wav\n1.5\t/y/f2.wav\n")
    result = compare_two_runs(str(a), str(b))
    assert result["improved"] == 1 and result["regressed"] == 1
    out = draw_hist([1, 2, 2, 3], "test", str(tmp_path / "h.png"))
    assert (tmp_path / "h.png").exists()


def test_reference_weight_init(rng):
    from fullsubnet_plus_tpu.nn.init import reference_weight_init
    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig

    cfg = FullSubNetPlusConfig(
        num_freqs=17, sb_num_neighbors=2, fb_model_hidden_size=8, sb_model_hidden_size=8
    )
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), cfg)
    re_init = reference_weight_init(jax.random.PRNGKey(1), params)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(re_init)
    w = re_init["sb_model"]["seq"]["layers"][0]["w_hh"]  # [H, 4H], wide
    # semi-orthogonal: rows orthonormal
    np.testing.assert_allclose(
        np.asarray(w @ w.T), np.eye(w.shape[0]), atol=1e-4
    )
