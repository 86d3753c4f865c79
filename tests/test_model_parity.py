"""End-to-end forward parity: our JAX models vs the actual PyTorch reference.

The reference code at /root/reference is executed read-only (librosa is
stubbed — it is only imported for wav loading, which these tests never touch).
Weights are initialized by torch, converted via io/torch_convert, and the two
forward passes must agree to float tolerance. This is SURVEY.md §4's pyramid
level 3 without needing the released checkpoint binary.
"""

import sys
import types

import numpy as np
import pytest
import torch

REFERENCE = "/root/reference/speech_enhance"


@pytest.fixture(scope="module")
def ref_modules():
    # Stub librosa (imported by audio_zen.acoustics.feature for wav IO only).
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        librosa.load = None
        sys.modules["librosa"] = librosa
    # Both forms are used inside the reference: `audio_zen.*` and
    # `speech_enhance.audio_zen.*`, so add both roots.
    for p in (REFERENCE, "/root/reference"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from fullsubnet_plus.model.fullsubnet_plus import FullSubNet_Plus
    from fullsubnet.model.fullsubnet import Model as FullSubNet

    return FullSubNet_Plus, FullSubNet


SHARED_ARGS = dict(
    num_freqs=257,
    look_ahead=2,
    sequence_model="LSTM",
    fb_num_neighbors=0,
    sb_num_neighbors=15,
    fb_output_activate_function="ReLU",
    sb_output_activate_function=False,
    fb_model_hidden_size=512,
    sb_model_hidden_size=384,
    norm_type="offline_laplace_norm",
    num_groups_in_drop_band=2,
    weight_init=False,
)


def test_fullsubnet_plus_forward_parity(ref_modules, rng):
    from fullsubnet_plus_tpu.models import fullsubnet_plus as jmodel
    from fullsubnet_plus_tpu.io.torch_convert import convert_fullsubnet_plus

    FullSubNet_Plus, _ = ref_modules
    torch.manual_seed(1)
    ref = FullSubNet_Plus(
        channel_attention_model="TSSE",
        kersize=[3, 5, 10],
        subband_num=1,
        **SHARED_ARGS,
    ).eval()

    T = 40
    mag = np.abs(rng.standard_normal((1, 1, 257, T))).astype(np.float32)
    real = rng.standard_normal((1, 1, 257, T)).astype(np.float32)
    imag = rng.standard_normal((1, 1, 257, T)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(mag), torch.from_numpy(real), torch.from_numpy(imag)
        ).numpy()

    params = convert_fullsubnet_plus(ref.state_dict())
    config = jmodel.FullSubNetPlusConfig()
    ours = np.asarray(jmodel.apply(params, mag, real, imag, config, training=False))

    assert ours.shape == ref_out.shape == (1, 2, 257, T)
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)


def test_fullsubnet_plus_training_dropband_parity(ref_modules, rng):
    from fullsubnet_plus_tpu.models import fullsubnet_plus as jmodel
    from fullsubnet_plus_tpu.io.torch_convert import convert_fullsubnet_plus

    FullSubNet_Plus, _ = ref_modules
    torch.manual_seed(2)
    ref = FullSubNet_Plus(
        channel_attention_model="TSSE", kersize=[3, 5, 10], subband_num=1, **SHARED_ARGS
    ).eval()

    B, T = 4, 20
    mag = np.abs(rng.standard_normal((B, 1, 257, T))).astype(np.float32)
    real = rng.standard_normal((B, 1, 257, T)).astype(np.float32)
    imag = rng.standard_normal((B, 1, 257, T)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(mag), torch.from_numpy(real), torch.from_numpy(imag)
        ).numpy()  # batch>1 -> reference applies drop_band
    params = convert_fullsubnet_plus(ref.state_dict())
    ours = np.asarray(
        jmodel.apply(params, mag, real, imag, jmodel.FullSubNetPlusConfig(), training=True)
    )
    assert ours.shape == ref_out.shape == (B, 2, 128, T)
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)


def test_fullsubnet_forward_parity(ref_modules, rng):
    from fullsubnet_plus_tpu.models import fullsubnet as jmodel
    from fullsubnet_plus_tpu.io.torch_convert import convert_fullsubnet

    _, FullSubNet = ref_modules
    torch.manual_seed(3)
    ref = FullSubNet(**SHARED_ARGS).eval()

    T = 30
    mag = np.abs(rng.standard_normal((1, 1, 257, T))).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mag)).numpy()
    params = convert_fullsubnet(ref.state_dict())
    ours = np.asarray(
        jmodel.apply(params, mag, jmodel.FullSubNetConfig(), training=False)
    )
    assert ours.shape == ref_out.shape == (1, 2, 257, T)
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)


def test_fullsubnet_plus_se_variant_forward_parity(ref_modules, rng):
    """The config-selectable SE channel-attention variant, end to end through
    the converter (the shipped config uses TSSE; SE/ECA/CBAM are the
    reference's alternatives, fullsubnet_plus.py channel_attention_model)."""
    from fullsubnet_plus_tpu.models import fullsubnet_plus as jmodel
    from fullsubnet_plus_tpu.io.torch_convert import convert_fullsubnet_plus

    FullSubNet_Plus, _ = ref_modules
    torch.manual_seed(6)
    ref = FullSubNet_Plus(
        channel_attention_model="SE", kersize=[3, 5, 10], subband_num=1,
        **SHARED_ARGS,
    ).eval()

    T = 24
    mag = np.abs(rng.standard_normal((1, 1, 257, T))).astype(np.float32)
    real = rng.standard_normal((1, 1, 257, T)).astype(np.float32)
    imag = rng.standard_normal((1, 1, 257, T)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(mag), torch.from_numpy(real), torch.from_numpy(imag)
        ).numpy()
    params = convert_fullsubnet_plus(
        ref.state_dict(), channel_attention_model="SE"
    )
    config = jmodel.FullSubNetPlusConfig(channel_attention_model="SE")
    ours = np.asarray(jmodel.apply(params, mag, real, imag, config, training=False))
    assert ours.shape == ref_out.shape == (1, 2, 257, T)
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)


def test_fullsubnet_plus_subband2_forward_parity(ref_modules, rng):
    """The subband_num=2 grouped path (reference fullsubnet_plus.py:146-153:
    reflect-pad freq, fold subband groups into the time axis for the
    attention, unfold back) vs the live reference, end to end through the
    converter. Uses ECA attention — the ONLY attention that can run with
    subband_num > 1 (see test_fullsubnet_plus_subband2_tsse_crashes_in_ref:
    the reference's real/imag branches crash every channel-count-dependent
    attention)."""
    from fullsubnet_plus_tpu.models import fullsubnet_plus as jmodel
    from fullsubnet_plus_tpu.io.torch_convert import (
        convert_fullsubnet_plus,
        export_fullsubnet_plus,
    )

    FullSubNet_Plus, _ = ref_modules
    torch.manual_seed(8)
    ref = FullSubNet_Plus(
        channel_attention_model="ECA", kersize=[3, 5, 10], subband_num=2,
        **SHARED_ARGS,
    ).eval()
    assert ref.num_channels == 129  # F//s + 1

    T = 24
    mag = np.abs(rng.standard_normal((1, 1, 257, T))).astype(np.float32)
    real = rng.standard_normal((1, 1, 257, T)).astype(np.float32)
    imag = rng.standard_normal((1, 1, 257, T)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(mag), torch.from_numpy(real), torch.from_numpy(imag)
        ).numpy()
    params = convert_fullsubnet_plus(
        ref.state_dict(), channel_attention_model="ECA"
    )
    config = jmodel.FullSubNetPlusConfig(
        channel_attention_model="ECA", subband_num=2
    )
    assert config.num_channels == 129
    ours = np.asarray(jmodel.apply(params, mag, real, imag, config, training=False))
    assert ours.shape == ref_out.shape == (1, 2, 257, T)
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)

    # Converter round-trip at the subband_num=2 shape: export -> strict torch
    # load -> convert back -> bit-identical tree.
    import jax

    sd = {k: torch.from_numpy(v.copy())
          for k, v in export_fullsubnet_plus(
              params, channel_attention_model="ECA").items()}
    ref.load_state_dict(sd, strict=True)
    back = convert_fullsubnet_plus(
        {k: v.numpy() for k, v in sd.items()}, channel_attention_model="ECA"
    )
    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32), b)


def test_fullsubnet_plus_subband2_tsse_crashes_in_ref(ref_modules, rng):
    """Documents the reference quirk our init guard mirrors: with
    subband_num > 1 only the mag branch folds sub-bands, so the reference's
    real/imag branches feed [B, 257, T] into attentions sized for 129
    channels and the forward CRASHES for TSSE (grouped conv channel
    mismatch, fullsubnet_plus.py:157-164). Our init refuses the config with
    an explanation instead of failing deep inside the real branch."""
    import pytest
    import jax
    from fullsubnet_plus_tpu.models import fullsubnet_plus as jmodel

    FullSubNet_Plus, _ = ref_modules
    torch.manual_seed(9)
    ref = FullSubNet_Plus(
        channel_attention_model="TSSE", kersize=[3, 5, 10], subband_num=2,
        **SHARED_ARGS,
    ).eval()  # constructs fine; the crash is in forward
    T = 8
    mag = np.abs(rng.standard_normal((1, 1, 257, T))).astype(np.float32)
    with torch.no_grad(), pytest.raises(RuntimeError, match="groups"):
        ref(torch.from_numpy(mag), torch.from_numpy(mag), torch.from_numpy(mag))

    with pytest.raises(ValueError, match="subband_num"):
        jmodel.init(
            jax.random.PRNGKey(0),
            jmodel.FullSubNetPlusConfig(
                channel_attention_model="TSSE", subband_num=2
            ),
        )


def test_param_count_matches_paper(ref_modules):
    """8.67 M params for the shipped FullSubNet+ (SURVEY.md §2.6)."""
    import jax
    from fullsubnet_plus_tpu.models import fullsubnet_plus as jmodel

    params = jmodel.init(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert 8.5e6 < n < 8.9e6, f"param count {n}"


def test_export_state_dict_roundtrip(ref_modules, rng):
    """Our params -> reference torch state_dict (strict load) -> same forward.

    The reverse converter (io/torch_convert.export_fullsubnet_plus) lets a
    model trained in this framework be served by the reference PyTorch code.
    """
    import jax
    from fullsubnet_plus_tpu.models import fullsubnet_plus as jmodel
    from fullsubnet_plus_tpu.io.torch_convert import (
        convert_fullsubnet_plus,
        export_fullsubnet_plus,
    )

    FullSubNet_Plus, _ = ref_modules
    params = jmodel.init(jax.random.PRNGKey(42))
    sd = {k: torch.from_numpy(v.copy()) for k, v in export_fullsubnet_plus(params).items()}

    ref = FullSubNet_Plus(
        channel_attention_model="TSSE", kersize=[3, 5, 10], subband_num=1, **SHARED_ARGS
    ).eval()
    # strict load: key sets must match the reference module tree exactly
    ref.load_state_dict(sd, strict=True)

    T = 24
    mag = np.abs(rng.standard_normal((1, 1, 257, T))).astype(np.float32)
    real = rng.standard_normal((1, 1, 257, T)).astype(np.float32)
    imag = rng.standard_normal((1, 1, 257, T)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(mag), torch.from_numpy(real), torch.from_numpy(imag)
        ).numpy()
    ours = np.asarray(
        jmodel.apply(params, mag, real, imag, jmodel.FullSubNetPlusConfig(), training=False)
    )
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)

    # and the numeric inverse: convert(export(p)) == p exactly
    back = convert_fullsubnet_plus({k: v.numpy() for k, v in sd.items()})
    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32), b)


def test_export_fullsubnet_roundtrip(ref_modules, rng):
    import jax
    from fullsubnet_plus_tpu.models import fullsubnet as jmodel
    from fullsubnet_plus_tpu.io.torch_convert import export_fullsubnet

    _, FullSubNet = ref_modules
    params = jmodel.init(jax.random.PRNGKey(7))
    sd = {k: torch.from_numpy(v.copy()) for k, v in export_fullsubnet(params).items()}
    ref = FullSubNet(**SHARED_ARGS).eval()
    ref.load_state_dict(sd, strict=True)

    T = 16
    mag = np.abs(rng.standard_normal((1, 1, 257, T))).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mag)).numpy()
    ours = np.asarray(jmodel.apply(params, mag, jmodel.FullSubNetConfig(), training=False))
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)


# (r5) test_time_major_fold_matches_channel_major was deleted with the
# rejected TIME_MAJOR_FOLD construction path it pinned (VERDICT r4 weak #3;
# record in docs/PERFORMANCE.md "Fold-construction probe"). Its removal also
# closes the r4 advisor finding that its finally-block leaked the flag's
# non-default value into the rest of the suite.
