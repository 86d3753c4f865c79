"""End-to-end dress rehearsal: train -> validate -> enhance -> metrics,
through the real CLIs, at the full 8.67 M-param model size, on whatever
backend JAX resolves (the real TPU chip under axon; CPU with
JAX_PLATFORMS=cpu).

This is the production-shaped proof the microbenches can't give: the exact
user surface (`cli.train` with the reference-shaped TOML, the bucketed
validation epoch + best-model gate, `cli.enhance` on the gated checkpoint,
`cli.calculate_metrics` with DNS_1 pairing) run as subprocesses on a
synthetic-but-spectrally-honest corpus, ending in a measured
enhanced-vs-noisy metric delta.

    python scripts/dress_rehearsal.py --workdir /tmp/dress \
        [--epochs 10] [--num-clean 360] [--num-val 20] [--fp32]

The corpus is generated in-process (no egress in this image; reference's
DNS download scripts need the network): "speech" = harmonic series with
randomized f0 contours, formant envelopes and syllabic gating; "noise" =
pink noise / AM white noise / tonal hum mixtures; RIRs = exponentially
decaying noise tails. Spectra overlap — the task is honest, just small.

Results land in <workdir>/summary.json and on stdout as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fullsubnet_plus_tpu.data.wav import write_wav  # noqa: E402

SR = 16000


# ---------------------------------------------------------------------------
# Corpus synthesis
# ---------------------------------------------------------------------------

def speech_like(rng: np.random.Generator, seconds: float) -> np.ndarray:
    """Voiced harmonic 'utterance': f0 drift + vibrato, 3-formant envelope,
    syllabic on/off gating with pauses."""
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = rng.uniform(90.0, 250.0)
    f0_t = f0 * (
        1.0
        + 0.02 * np.sin(2 * np.pi * rng.uniform(4.0, 6.5) * t)
        + 0.08 * np.sin(2 * np.pi * rng.uniform(0.15, 0.5) * t + rng.uniform(0, 6.28))
    )
    phase = 2 * np.pi * np.cumsum(f0_t) / SR
    formants = rng.uniform([300.0, 900.0, 1900.0], [850.0, 1900.0, 3400.0])
    bws = np.array([130.0, 220.0, 350.0])
    sig = np.zeros(n)
    for k in range(1, 40):
        fk = k * f0
        if fk > 7500.0:
            break
        amp = float(np.sum(np.exp(-(((fk - formants) / bws) ** 2)))) + 0.02
        amp *= 1.0 / k**0.5
        sig += amp * np.sin(k * phase + rng.uniform(0, 2 * np.pi))

    # Syllabic gating: alternating voiced segments and pauses.
    env = np.zeros(n)
    pos = 0
    while pos < n:
        seg = int(rng.uniform(0.12, 0.45) * SR)
        gap = int(rng.uniform(0.04, 0.25) * SR)
        seg = min(seg, n - pos)
        ramp = min(int(0.02 * SR), max(seg // 4, 1))
        e = np.ones(seg)
        e[:ramp] = np.linspace(0, 1, ramp)
        e[-ramp:] = np.linspace(1, 0, ramp)
        env[pos : pos + seg] = e * rng.uniform(0.5, 1.0)
        pos += seg + gap
    sig = sig * env
    peak = np.max(np.abs(sig)) + 1e-9
    return (0.7 * sig / peak).astype(np.float32)


def _pink(rng, n):
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.maximum(np.fft.rfftfreq(n, 1.0 / SR), 1.0)
    return np.fft.irfft(spec / np.sqrt(f), n)


def noise_like(rng: np.random.Generator, seconds: float) -> np.ndarray:
    """Pink noise + AM white bursts + mains-hum harmonics, random mix."""
    n = int(seconds * SR)
    t = np.arange(n) / SR
    out = _pink(rng, n) * rng.uniform(0.5, 1.5)
    if rng.random() < 0.6:
        am = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(0.3, 3.0) * t))
        out += rng.uniform(0.2, 0.8) * am * rng.standard_normal(n)
    if rng.random() < 0.5:
        base = rng.uniform(45.0, 220.0)
        for k in range(1, 6):
            out += (
                rng.uniform(0.05, 0.3)
                / k
                * np.sin(2 * np.pi * base * k * t + rng.uniform(0, 6.28))
            )
    peak = np.max(np.abs(out)) + 1e-9
    return (0.7 * out / peak).astype(np.float32)


def rir_like(rng: np.random.Generator, seconds: float = 0.3) -> np.ndarray:
    n = int(seconds * SR)
    tail = rng.standard_normal(n) * np.exp(-np.arange(n) / (rng.uniform(0.02, 0.08) * SR))
    tail[0] = 1.0
    return (tail / np.max(np.abs(tail))).astype(np.float32)


def build_corpus(workdir: str, num_clean: int, num_noise: int, num_val: int,
                 seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    paths = {}
    for sub in ("clean", "noise", "rir", "val/no_reverb/noisy",
                "val/no_reverb/clean"):
        os.makedirs(os.path.join(workdir, sub), exist_ok=True)

    clean_files = []
    for i in range(num_clean):
        p = os.path.join(workdir, "clean", f"clean_{i:04d}.wav")
        write_wav(p, speech_like(rng, 4.0), SR)
        clean_files.append(p)
    noise_files = []
    for i in range(num_noise):
        p = os.path.join(workdir, "noise", f"noise_{i:04d}.wav")
        write_wav(p, noise_like(rng, 6.0), SR)
        noise_files.append(p)
    rir_files = []
    for i in range(8):
        p = os.path.join(workdir, "rir", f"rir_{i}.wav")
        write_wav(p, rir_like(rng), SR)
        rir_files.append(p)

    for name, files in (("clean.txt", clean_files), ("noise.txt", noise_files),
                        ("rir.txt", rir_files)):
        with open(os.path.join(workdir, name), "w") as f:
            f.write("\n".join(files) + "\n")
    paths["clean_list"] = os.path.join(workdir, "clean.txt")
    paths["noise_list"] = os.path.join(workdir, "noise.txt")
    paths["rir_list"] = os.path.join(workdir, "rir.txt")

    # Validation set: DNS no-reverb layout, fixed SNRs, held-out signals.
    val_rng = np.random.default_rng(seed + 10_000)
    for i in range(num_val):
        clean = speech_like(val_rng, 4.0)
        noise = noise_like(val_rng, 4.0)
        snr = float(val_rng.uniform(0.0, 15.0))
        scale = np.sqrt(
            np.mean(clean**2) / (10 ** (snr / 10) * np.mean(noise**2) + 1e-12)
        )
        noisy = clean + scale * noise
        peak = max(np.max(np.abs(noisy)), 1.0)
        write_wav(
            os.path.join(workdir, "val/no_reverb/noisy",
                         f"synthetic_snr{snr:.0f}_fileid_{i}.wav"),
            (noisy / peak).astype(np.float32), SR,
        )
        write_wav(
            os.path.join(workdir, "val/no_reverb/clean",
                         f"clean_fileid_{i}.wav"),
            (clean / peak).astype(np.float32), SR,
        )
    paths["val_dir"] = os.path.join(workdir, "val/no_reverb/")
    return paths


# ---------------------------------------------------------------------------
# Config + pipeline
# ---------------------------------------------------------------------------

def write_train_config(workdir: str, paths: dict, batch_size: int) -> str:
    from fullsubnet_plus_tpu.utils.config import dump_config, load_config

    config = load_config(os.path.join(REPO, "configs", "train.toml"))
    config["meta"]["save_dir"] = os.path.join(workdir, "logs")
    config["meta"]["experiment_name"] = "dress_rehearsal"
    ds = config["train_dataset"]["args"]
    ds["clean_dataset"] = paths["clean_list"]
    ds["noise_dataset"] = paths["noise_list"]
    ds["rir_dataset"] = paths["rir_list"]
    ds["num_workers"] = 2
    config["train_dataset"]["dataloader"]["batch_size"] = batch_size
    config["train_dataset"]["dataloader"]["num_workers"] = 2
    config["validation_dataset"]["args"]["dataset_dir_list"] = [paths["val_dir"]]
    config["trainer"]["validation"]["validation_interval"] = 2
    config["trainer"]["visualization"]["metrics"] = [
        "WB_PESQ_EST", "STOI", "SI_SDR"
    ]
    config["trainer"]["visualization"]["num_workers"] = 2
    out = os.path.join(workdir, "train.toml")
    dump_config(config, out)
    return out


def run(cmd, log_path, timeout_s):
    print(f"[dress] $ {' '.join(cmd)}")
    t0 = time.time()
    with open(log_path, "a") as log:
        log.write(f"\n$ {' '.join(cmd)}\n")
        log.flush()
        proc = subprocess.run(
            cmd, stdout=log, stderr=subprocess.STDOUT, timeout=timeout_s,
            cwd=REPO,
        )
    dt = time.time() - t0
    if proc.returncode != 0:
        tail = open(log_path).read()[-3000:]
        raise RuntimeError(f"{cmd[2]} failed (rc={proc.returncode}):\n{tail}")
    print(f"[dress]   done in {dt:.0f}s")
    return dt


def metric_means(ref_dir, est_dir, log_path,
                 metrics="WB_PESQ_EST,NB_PESQ_EST,STOI,SI_SDR"):
    cmd = [sys.executable, "-m", "fullsubnet_plus_tpu.cli.calculate_metrics",
           "-R", ref_dir, "-E", est_dir, "-M", metrics, "-S", "DNS_1",
           "--workers", "2"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                         cwd=REPO)
    with open(log_path, "a") as log:
        log.write(f"\n$ {' '.join(cmd)}\n{out.stdout}{out.stderr}")
    if out.returncode != 0:
        raise RuntimeError(f"calculate_metrics failed: {out.stderr[-2000:]}")
    means = {}
    # Anchor to the requested metric names: the CLI also prints timing/count
    # "word: float" lines that must not leak into summary.json.
    pattern = re.compile(
        rf"({'|'.join(re.escape(m) for m in metrics.split(','))}): (-?\d+\.\d+)"
    )
    for line in out.stdout.splitlines():
        m = pattern.match(line)
        if m:
            means[m.group(1)] = float(m.group(2))
    return means


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--workdir", default="/tmp/dress_rehearsal")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch", type=int, default=18)
    parser.add_argument("--num-clean", type=int, default=360)
    parser.add_argument("--num-noise", type=int, default=48)
    parser.add_argument("--num-val", type=int, default=20)
    parser.add_argument("--fp32", action="store_true",
                        help="train in fp32 (default bf16, the measured config)")
    parser.add_argument("--resume", action="store_true",
                        help="pass -R to cli.train: continue a partial run "
                             "(e.g. after a transient backend failure the "
                             "trainer checkpoint-and-exited from)")
    parser.add_argument("--train-timeout", type=float, default=7200.0)
    args = parser.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    log_path = os.path.join(args.workdir, "dress.log")
    summary = {"workdir": args.workdir, "epochs": args.epochs,
               "batch": args.batch, "wall": {}}

    print("[dress] building corpus ...")
    t0 = time.time()
    paths = build_corpus(args.workdir, args.num_clean, args.num_noise,
                         args.num_val)
    summary["wall"]["corpus_s"] = round(time.time() - t0, 1)

    cfg = write_train_config(args.workdir, paths, args.batch)

    train_cmd = [sys.executable, "-m", "fullsubnet_plus_tpu.cli.train",
                 "-C", cfg, "--epochs", str(args.epochs)]
    if not args.fp32:
        train_cmd.append("--bf16")
    if args.resume:
        train_cmd.append("-R")
    summary["wall"]["train_s"] = round(
        run(train_cmd, log_path, args.train_timeout), 1)

    save_dir = os.path.join(args.workdir, "logs", "dress_rehearsal")
    best = os.path.join(save_dir, "checkpoints", "best_model.npz")
    if not os.path.exists(best):
        best = os.path.join(save_dir, "checkpoints", "latest_model.npz")
    summary["checkpoint"] = best

    # Parse the train log for the loss / validation-metric trajectories.
    text = open(os.path.join(save_dir, "train.log")).read()
    losses = re.findall(r"\[Train\] epoch \d+ loss (\d+\.\d+)", text)
    summary["train_losses"] = [float(x) for x in losses]
    summary["val_trajectory"] = {}
    for epoch, _split, metric, val in re.findall(
        r"\[Val\] epoch (\d+) (\w+) (WB_PESQ_EST|STOI|SI_SDR) (-?\d+\.\d+)",
        text,
    ):
        summary["val_trajectory"].setdefault(metric, []).append(
            (int(epoch), float(val))
        )

    enhanced_dir = os.path.join(args.workdir, "enhanced")
    summary["wall"]["enhance_s"] = round(run(
        [sys.executable, "-m", "fullsubnet_plus_tpu.cli.enhance",
         "-C", os.path.join(REPO, "configs", "inference.toml"),
         "-M", best, "-I", os.path.join(paths["val_dir"], "noisy"),
         "-O", enhanced_dir, "--batch", "8"],
        log_path, 3600), 1)

    clean_dir = os.path.join(paths["val_dir"], "clean")
    summary["metrics_noisy"] = metric_means(
        clean_dir, os.path.join(paths["val_dir"], "noisy"), log_path)
    summary["metrics_enhanced"] = metric_means(clean_dir, enhanced_dir, log_path)
    summary["delta"] = {
        k: round(summary["metrics_enhanced"][k] - v, 4)
        for k, v in summary["metrics_noisy"].items()
        if k in summary["metrics_enhanced"]
    }

    with open(os.path.join(args.workdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
