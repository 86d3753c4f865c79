"""Offline enhancement CLI (reference tools/inference.py + inference.sh).

    python -m fullsubnet_plus_tpu.cli.enhance -C config/inference.toml \
        -M checkpoint(.npz|.tar|.pth) -I noisy_dir -O out_dir [--batch N]

Accepts both our .npz checkpoints and the reference's torch .tar/.pth
(converted on the fly). Utterances are bucketed by length and enhanced in
batches — the reference loops file-by-file at batch 1; batching is where the
TPU throughput comes from. Output rescale to 0.8·int16 peak matches
base_inferencer.py:151-152 for waveform parity.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def run_enhance(config: dict, checkpoint_path: str, output_dir: str,
                input_dirs=None, batch_size: int = 8,
                compute_dtype: str | None = None) -> dict:
    """compute_dtype: None (fp32 parity path), "bfloat16", or "int8" (the
    int8-recurrent serving mode — see docs/PERFORMANCE.md). CLI --dtype or
    the config's [inferencer.args] compute_dtype select it."""
    import jax

    from fullsubnet_plus_tpu.data.datasets import InferenceDataset
    from fullsubnet_plus_tpu.data.wav import write_wav
    from fullsubnet_plus_tpu.enhance import Enhancer
    from fullsubnet_plus_tpu.io.checkpoint import load_flat, load_torch_checkpoint, nested_from_flat
    from fullsubnet_plus_tpu.models import get_model
    from fullsubnet_plus_tpu.utils import logger

    model_name = config["model"]["path"]
    model_def = get_model(model_name)
    model_config = model_def.make_config(config["model"]["args"])

    if checkpoint_path.endswith((".tar", ".pth")):
        params = load_torch_checkpoint(checkpoint_path, model_name)
    else:
        flat, meta = load_flat(checkpoint_path)
        params = nested_from_flat(
            {k.removeprefix("params/"): v for k, v in flat.items() if k.startswith("params/")}
            or flat
        )

    acoustics = config.get("acoustics", {})
    inferencer_cfg = config.get("inferencer", {})
    enhancer = Enhancer(
        model_def,
        model_config,
        params,
        inference_type=inferencer_cfg.get("type", "mag_complex_full_band_crm_mask"),
        n_fft=acoustics.get("n_fft", 512),
        hop_length=acoustics.get("hop_length", 256),
        win_length=acoustics.get("win_length", 512),
        sr=acoustics.get("sr", 16000),
        n_neighbor=inferencer_cfg.get("args", {}).get("n_neighbor", 15),
        compute_dtype=(
            compute_dtype
            if compute_dtype is not None
            else inferencer_cfg.get("args", {}).get("compute_dtype")
        ),
        inference_args=inferencer_cfg.get("args", {}),
    )

    dirs = input_dirs or config["dataset"]["args"]["dataset_dir_list"]
    sr = acoustics.get("sr", 16000)
    dataset = InferenceDataset(dirs, sr=sr)
    os.makedirs(output_dir, exist_ok=True)

    # Bucket by padded length so XLA compiles only a handful of shapes.
    bucket_quantum = sr  # 1 s
    items = []
    for i in range(len(dataset)):
        wav, name = dataset[i]
        items.append((wav, name))
    items.sort(key=lambda kv: len(kv[0]))

    # Pipelined serving loop: the main thread only pads and DISPATCHES
    # batches (jit dispatch is asynchronous, so batch i+1 is enqueued while
    # the device still runs batch i); a single writer thread fetches each
    # finished batch (the blocking device→host transfer), rescales, and
    # writes wavs. Dispatch, transfer, and file I/O therefore overlap —
    # the reference loops file-by-file fully serialized (base_inferencer
    # .py:134-160). A bounded window of in-flight batches keeps queued
    # device buffers from growing with the dataset (HBM backpressure).
    from concurrent.futures import ThreadPoolExecutor

    length_aware = enhancer.inference_type in Enhancer.LENGTH_AWARE_MODES
    in_flight_window = 4

    def _finish(enhanced_dev, batch, t_dispatch):
        enhanced = np.asarray(enhanced_dev)  # blocks until the batch is done
        for j, (w, name) in enumerate(batch):
            y = enhanced[j, : len(w)]
            peak = np.max(np.abs(y)) + 1e-12
            if peak > 1.0:
                logger.log(f"Warning: enhanced |{name}| > 1 before rescale")
            y = y / peak * 0.8
            write_wav(os.path.join(output_dir, f"{name}.wav"), y, sr)
        audio_s = sum(len(w) for w, _ in batch) / sr
        wall = time.perf_counter() - t_dispatch
        logger.log(
            f"batch of {len(batch)} ({audio_s:.1f} audio-s) done "
            f"{wall:.2f}s after dispatch, rtf={wall / audio_s:.4f}"
        )
        return audio_s

    t_start = time.perf_counter()
    futures = []
    total_audio_s = 0.0
    with ThreadPoolExecutor(max_workers=1) as writer:
        i = 0
        while i < len(items):
            batch = items[i : i + batch_size]
            max_len = max(len(w) for w, _ in batch)
            padded_len = -(-max_len // bucket_quantum) * bucket_quantum
            stacked = np.zeros((len(batch), padded_len), np.float32)
            for j, (w, _) in enumerate(batch):
                stacked[j, : len(w)] = w
            # masked statistics: bucket padding must not perturb a shorter
            # utterance's normalization (models/*.apply valid_frames)
            lengths = (
                np.asarray([len(w) for w, _ in batch]) if length_aware else None
            )
            enhanced_dev = enhancer.enhance_batch(
                stacked, lengths=lengths, blocking=False
            )
            futures.append(writer.submit(_finish, enhanced_dev, batch,
                                         time.perf_counter()))
            if len(futures) >= in_flight_window:
                total_audio_s += futures.pop(0).result()
            i += batch_size
        total_audio_s += sum(f.result() for f in futures)
    total_wall = time.perf_counter() - t_start

    stats = {
        "files": len(items),
        "audio_seconds": total_audio_s,
        "wall_seconds": total_wall,
        "throughput_audio_s_per_s": total_audio_s / max(total_wall, 1e-9),
    }
    logger.log(f"enhanced {stats['files']} files: "
               f"{stats['throughput_audio_s_per_s']:.1f} audio-s/s")
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser(description="Batched offline enhancement")
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("-M", "--model_checkpoint_path", required=True)
    parser.add_argument("-I", "--dataset_dir_list", default=None,
                        help="comma-separated noisy dirs (overrides config)")
    parser.add_argument("-O", "--output_dir", required=True)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--dtype", choices=["float32", "bfloat16", "int8"],
                        default=None,
                        help="model compute dtype: float32 = parity path "
                             "(default), bfloat16 = TPU fast path, int8 = "
                             "int8-recurrent serving mode (fastest)")
    args = parser.parse_args(argv)

    from fullsubnet_plus_tpu.utils.config import load_config
    from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    config = load_config(args.configuration)
    input_dirs = args.dataset_dir_list.split(",") if args.dataset_dir_list else None
    run_enhance(
        config,
        args.model_checkpoint_path,
        args.output_dir,
        input_dirs=input_dirs,
        batch_size=args.batch,
        compute_dtype=args.dtype,
    )


if __name__ == "__main__":
    main()
