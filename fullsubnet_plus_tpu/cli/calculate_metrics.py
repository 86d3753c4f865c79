"""Offline metric CLI (reference tools/calculate_metrics.py:61-227).

    python -m fullsubnet_plus_tpu.cli.calculate_metrics \
        -R clean_dir -E enhanced_dir -M SI_SDR,STOI [-S DNS_1] [-D out_dir]

Pairs reference/estimate files (including the DNS-1 "clean_fileid_N" ↔
"..._fileid_N" realignment), computes each metric in a thread pool, prints
means, and writes ranked per-file results.
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from fullsubnet_plus_tpu.data.wav import read_wav
from fullsubnet_plus_tpu.eval.metrics import compute_metric, metric_available


def _list_wavs(path: str):
    if path.endswith(".scp") or path.endswith(".txt"):
        with open(path) as f:
            return [line.strip() for line in f if line.strip()]
    out = []
    for root, _, files in os.walk(path):
        for fname in sorted(files):
            if fname.endswith(".wav"):
                out.append(os.path.join(root, fname))
    return sorted(out)


def _fileid(path: str) -> str:
    stem = os.path.splitext(os.path.basename(path))[0]
    return stem.split("fileid_")[-1] if "fileid_" in stem else stem


def pair_files(reference_dir: str, estimated_dir: str, specific_dataset: str | None):
    """Reference pre_processing (calculate_metrics.py:61-113)."""
    ref = _list_wavs(reference_dir)
    est = _list_wavs(estimated_dir)
    if specific_dataset in ("DNS_1", "DNS_2"):
        est_by_id = {_fileid(p): p for p in est}
        pairs = []
        for r in ref:
            fid = _fileid(r)
            if fid in est_by_id:
                pairs.append((r, est_by_id[fid]))
        return pairs
    assert len(ref) == len(est), (
        f"reference ({len(ref)}) and estimated ({len(est)}) counts differ"
    )
    return list(zip(ref, est))


def main(argv=None):
    parser = argparse.ArgumentParser(description="Compute speech metrics")
    parser.add_argument("-R", "--reference_dir", required=True)
    parser.add_argument("-E", "--estimated_dir", required=True)
    parser.add_argument("-M", "--metrics", default="SI_SDR,STOI")
    parser.add_argument("-S", "--specific_dataset", default=None,
                        choices=[None, "DNS_1", "DNS_2"])
    parser.add_argument("-D", "--dst_dir", default=None,
                        help="write ranked per-file txt here")
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--limit", type=int, default=None,
                        help="cap the number of file pairs scored")
    parser.add_argument("--offset", type=int, default=0,
                        help="skip this many file pairs first")
    args = parser.parse_args(argv)

    pairs = pair_files(args.reference_dir, args.estimated_dir, args.specific_dataset)
    # Reference surface parity: calculate_metrics.py:217-218 exposes the same
    # offset/limit windowing over the pair list.
    pairs = pairs[args.offset :]
    if args.limit is not None:
        pairs = pairs[: args.limit]
    assert pairs, "no file pairs found"
    metrics = [m.strip() for m in args.metrics.split(",") if m.strip()]

    loaded = []
    for r, e in pairs:
        loaded.append((read_wav(r, sr=args.sr), read_wav(e, sr=args.sr), r))

    for metric in metrics:
        if not metric_available(metric):
            print(f"{metric}: SKIPPED (implementation not available in this image)")
            continue
        with ThreadPoolExecutor(max_workers=args.workers) as ex:
            vals = list(
                ex.map(
                    lambda t: compute_metric(
                        metric, t[0], t[1][: len(t[0])], sr=args.sr
                    ),
                    loaded,
                )
            )
        mean = float(np.mean(vals))
        print(f"{metric}: {mean:.4f}  (n={len(vals)})")
        if args.dst_dir:
            os.makedirs(args.dst_dir, exist_ok=True)
            ranked = sorted(zip(vals, (t[2] for t in loaded)))
            with open(os.path.join(args.dst_dir, f"{metric}.txt"), "w") as f:
                f.write(f"mean: {mean:.6f}\n")
                for v, path in ranked:
                    f.write(f"{v:.6f}\t{path}\n")


if __name__ == "__main__":
    main()
