"""One-command released-checkpoint waveform-parity harness.

    # Offline self-check against the committed fixture (runs today, no data):
    python -m fullsubnet_plus_tpu.cli.verify_parity

    # The day a real checkpoint (e.g. the released best_model.tar) exists:
    python -m fullsubnet_plus_tpu.cli.verify_parity -M best_model.tar \
        [-I some.wav] [-O enhanced.wav]

The north-star parity target (BASELINE.md) is waveform-allclose against the
released checkpoint from the reference README — unreachable in this image
(network egress is blocked; verified round 1). This harness makes that check
one command in both worlds:

* Without -M it rebuilds the torch reference FullSubNet_Plus at the pinned
  seed recorded in tests/fixtures/parity_fixture.npz, converts the weights,
  runs OUR pipeline (stft -> model -> cIRM -> istft -> 0.8-peak rescale,
  matching fullsubnet_plus/inferencer/inferencer.py:141-160 +
  base_inferencer.py:148-152), and compares against the fixture waveform the
  live torch reference generated — so model/converter/DSP drift fails here
  even fully offline.
* With -M it converts the checkpoint (torch .tar/.pth or our .npz), enhances
  the input (default: the fixture's input), and — when the torch reference
  code is importable — ALSO runs the reference pipeline live with the same
  checkpoint and compares the two waveforms directly.

Parity numbers are only meaningful at fp32/HIGHEST precision on CPU; the
harness forces that by default (--device tpu opts out: the TPU's bf16-like
default matmul precision bounds agreement to ~20-35 dB on this 8-TCN-block
model, a precision artifact, not a bug — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "parity_fixture.npz",
)
REFERENCE = "/root/reference/speech_enhance"


def snr_db(ref: np.ndarray, est: np.ndarray) -> float:
    err = np.linalg.norm(est - ref)
    return float(20 * np.log10((np.linalg.norm(ref) + 1e-12) / (err + 1e-12)))


def _reference_importable() -> bool:
    return os.path.isdir(REFERENCE)


def _import_reference(model: str = "fullsubnet_plus"):
    sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    sys.path[:0] = [p for p in (REFERENCE, os.path.dirname(REFERENCE))
                    if p not in sys.path]
    if model == "fullsubnet":
        from fullsubnet.model.fullsubnet import Model as FullSubNet

        return FullSubNet
    from fullsubnet_plus.model.fullsubnet_plus import FullSubNet_Plus

    return FullSubNet_Plus


def _shipped_model_args(model: str = "fullsubnet_plus") -> dict:
    # config/train.toml:73-91 (SURVEY.md §2.6); the baseline drops the
    # attention/kersize/subband knobs (fullsubnet/model/fullsubnet.py:12-40)
    args = dict(
        num_freqs=257, look_ahead=2, sequence_model="LSTM",
        fb_num_neighbors=0, sb_num_neighbors=15,
        fb_output_activate_function="ReLU", sb_output_activate_function=False,
        fb_model_hidden_size=512, sb_model_hidden_size=384,
        norm_type="offline_laplace_norm",
        num_groups_in_drop_band=2, weight_init=False,
    )
    if model == "fullsubnet_plus":
        args.update(channel_attention_model="TSSE", kersize=[3, 5, 10],
                    subband_num=1)
    return args


def our_enhance(params, noisy: np.ndarray,
                model: str = "fullsubnet_plus") -> np.ndarray:
    """Our pipeline at the shipped config; returns the 0.8-peak-rescaled
    float waveform (the value the reference int16-quantizes on write).
    The baseline runs through full_band_crm_mask (BASELINE config #1)."""
    from fullsubnet_plus_tpu.enhance import Enhancer
    from fullsubnet_plus_tpu.models import get_model

    model_def = get_model(model)
    inference_type = ("mag_complex_full_band_crm_mask"
                      if model_def.n_inputs == 3 else "full_band_crm_mask")
    enhancer = Enhancer(model_def, model_def.make_config({}), params,
                        inference_type=inference_type)
    return enhancer.enhance(noisy.astype(np.float32))


def torch_enhance(state_dict, noisy: np.ndarray,
                  model_name: str = "fullsubnet_plus") -> np.ndarray:
    """The reference pipeline live (inferencer.py:141-160 + 0.8 rescale;
    baseline: inferencer.py:116-138, mag-only input)."""
    import torch

    cls = _import_reference(model_name)
    from audio_zen.acoustics.mask import decompress_cIRM

    model = cls(**_shipped_model_args(model_name)).eval()
    model.load_state_dict(
        {k.removeprefix("module."): torch.as_tensor(np.asarray(v))
         for k, v in state_dict.items()},
        strict=True,
    )
    with torch.no_grad():
        y = torch.from_numpy(noisy.astype(np.float32))[None]
        win = torch.hann_window(512)
        nc = torch.stft(y, 512, 256, 512, window=win, return_complex=True)
        if model_name == "fullsubnet":
            crm = model(nc.abs().unsqueeze(1))
        else:
            crm = model(
                nc.abs().unsqueeze(1), nc.real.unsqueeze(1), nc.imag.unsqueeze(1)
            )
        crm = crm.permute(0, 2, 3, 1)
        crm = decompress_cIRM(crm)
        er = crm[..., 0] * nc.real - crm[..., 1] * nc.imag
        ei = crm[..., 1] * nc.real + crm[..., 0] * nc.imag
        enhanced = torch.istft(torch.complex(er, ei), 512, 256, 512,
                               window=win, length=y.shape[-1])[0].numpy()
    return (0.8 * enhanced / np.max(np.abs(enhanced))).astype(np.float32)


def _load_params(path: str, model_name: str = "fullsubnet_plus"):
    from fullsubnet_plus_tpu.io.checkpoint import (
        load_flat, load_torch_checkpoint, nested_from_flat,
    )

    if path.endswith((".tar", ".pth")):
        return load_torch_checkpoint(path, model_name)
    flat, _ = load_flat(path)
    return nested_from_flat(
        {k.removeprefix("params/"): v for k, v in flat.items()
         if k.startswith("params/")} or flat
    )


def _torch_state_dict(path: str):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k.removeprefix("module."): v for k, v in sd.items()}


def run(model_path=None, input_path=None, output_path=None,
        fixture_path=FIXTURE, tol_db=55.0, model_name="fullsubnet_plus"):
    import jax

    from fullsubnet_plus_tpu.data.wav import read_wav, write_wav
    from fullsubnet_plus_tpu.utils import logger

    fx = np.load(fixture_path)
    noisy = (np.asarray(read_wav(input_path, sr=int(fx["sr"])), np.float32)
             if input_path else fx["noisy"])
    fixture_key = ("enhanced_ref" if model_name == "fullsubnet_plus"
                   else "enhanced_ref_fullsubnet")

    results = {}
    with jax.default_matmul_precision("highest"):
        if model_path is None:
            # offline self-check: rebuild the pinned-seed torch weights live
            if not _reference_importable():
                raise SystemExit(
                    "no -M given and the torch reference code is not "
                    "available to rebuild the pinned-seed weights; pass a "
                    "checkpoint with -M"
                )
            import torch

            from fullsubnet_plus_tpu.io.torch_convert import (
                convert_fullsubnet,
                convert_fullsubnet_plus,
            )

            cls = _import_reference(model_name)
            torch.manual_seed(int(fx["seed"]))
            tmodel = cls(**_shipped_model_args(model_name)).eval()
            convert = (convert_fullsubnet_plus if model_name == "fullsubnet_plus"
                       else convert_fullsubnet)
            params = convert(tmodel.state_dict())
            ours = our_enhance(params, noisy, model_name)
            if input_path is None and fixture_key in fx:
                results["vs_committed_fixture"] = snr_db(fx[fixture_key], ours)
            results["vs_live_torch"] = snr_db(
                torch_enhance(tmodel.state_dict(), noisy, model_name), ours)
        else:
            params = _load_params(model_path, model_name)
            ours = our_enhance(params, noisy, model_name)
            if model_path.endswith((".tar", ".pth")) and _reference_importable():
                ref = torch_enhance(_torch_state_dict(model_path), noisy,
                                    model_name)
                results["vs_live_torch"] = snr_db(ref, ours)
            else:
                logger.log(
                    "NOTE: torch reference not run "
                    "(checkpoint is .npz or /root/reference missing); "
                    "wrote our output only"
                )

    if output_path:
        write_wav(output_path, ours, int(fx["sr"]))
        logger.log(f"wrote {output_path}")

    ok = True
    int16_floor_db = 20 * np.log10(0.8 / (1 / 32768))  # quantization floor
    for name, db in results.items():
        verdict = "PASS" if db >= tol_db else "FAIL"
        ok &= db >= tol_db
        logger.log(f"parity {name}: {db:.1f} dB SNR (>= {tol_db:.0f} dB -> "
                   f"{verdict}; int16 write floor is {int16_floor_db:.0f} dB)")
    if not results:
        logger.log("no comparison target available — nothing verified")
        return True
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(
        description="released-checkpoint waveform-parity harness "
                    "(offline self-check without -M)")
    p.add_argument("-M", "--model_checkpoint_path", default=None,
                   help="torch .tar/.pth (e.g. the released best_model.tar — "
                        "unreachable in-image, egress is blocked) or our .npz")
    p.add_argument("-I", "--input_wav", default=None,
                   help="wav to enhance (default: the fixture's input)")
    p.add_argument("-O", "--output_wav", default=None)
    p.add_argument("--model", default="fullsubnet_plus",
                   choices=["fullsubnet_plus", "fullsubnet"],
                   help="model family: the shipped FullSubNet+ (default) or "
                        "the FullSubNet baseline via full_band_crm_mask")
    p.add_argument("--fixture", default=FIXTURE)
    p.add_argument("--tol-db", type=float, default=55.0,
                   help="minimum SNR (dB) between the waveforms to PASS")
    p.add_argument("--device", choices=["cpu", "tpu"], default="cpu",
                   help="cpu (default; fp32 parity) or tpu (bf16-like "
                        "matmuls bound agreement to ~20-35 dB)")
    args = p.parse_args(argv)

    if args.device == "cpu":
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    ok = run(args.model_checkpoint_path, args.input_wav, args.output_wav,
             args.fixture, args.tol_db, model_name=args.model)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
