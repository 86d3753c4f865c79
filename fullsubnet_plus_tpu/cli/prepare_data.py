"""Data preparation tools (reference tools/gen_lst.py, resample_dir.py,
collect_lst.py — the latter two shipped broken; fixed here).

    python -m fullsubnet_plus_tpu.cli.prepare_data gen-lst DIR OUT.txt
    python -m fullsubnet_plus_tpu.cli.prepare_data resample-dir SRC DST --sr 16000
    python -m fullsubnet_plus_tpu.cli.prepare_data collect-lst DIR OUT.txt \
        [--activity-threshold 0.6] [--min-seconds 3] [--check-clipping]
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

from fullsubnet_plus_tpu.data.wav import read_wav, write_wav, resample
from fullsubnet_plus_tpu.dsp.audio import activity_detector, is_clipped


def _walk_wavs(directory: str):
    out = []
    for root, _, files in os.walk(os.path.abspath(os.path.expanduser(directory))):
        for fname in sorted(files):
            if fname.lower().endswith(".wav"):
                out.append(os.path.join(root, fname))
    return sorted(out)


def gen_lst(args):
    """Recursive wav glob -> txt list (tools/gen_lst.py:5-11)."""
    files = _walk_wavs(args.directory)
    with open(args.output, "w") as f:
        f.write("\n".join(files) + ("\n" if files else ""))
    print(f"wrote {len(files)} paths to {args.output}")


def resample_dir(args):
    """Parallel resample of a tree (tools/resample_dir.py:7-25, sans sox)."""
    files = _walk_wavs(args.src)
    src_root = os.path.abspath(os.path.expanduser(args.src))
    dst_root = os.path.abspath(os.path.expanduser(args.dst))

    def work(path):
        rel = os.path.relpath(path, src_root)
        out = os.path.join(dst_root, rel)
        y = read_wav(path, sr=args.sr)
        write_wav(out, y, args.sr)

    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        list(ex.map(work, files))
    print(f"resampled {len(files)} files to {args.sr} Hz under {dst_root}")


def collect_lst(args):
    """Filtered corpus collection with VAD/clipping/duration gates
    (tools/collect_lst.py, with its missing-import and .as_posix bugs fixed)."""
    files = _walk_wavs(args.directory)
    kept = []

    def check(path):
        y = read_wav(path, sr=args.sr)
        if len(y) < args.min_seconds * args.sr:
            return None
        if args.check_clipping and is_clipped(y):
            return None
        if args.activity_threshold > 0:
            if activity_detector(y, fs=args.sr) < args.activity_threshold:
                return None
        return path

    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        for result in ex.map(check, files):
            if result:
                kept.append(result)
    with open(args.output, "w") as f:
        f.write("\n".join(kept) + ("\n" if kept else ""))
    print(f"kept {len(kept)}/{len(files)} files -> {args.output}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Data preparation")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("gen-lst")
    p.add_argument("directory")
    p.add_argument("output")
    p.set_defaults(fn=gen_lst)

    p = sub.add_parser("resample-dir")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--workers", type=int, default=8)
    p.set_defaults(fn=resample_dir)

    p = sub.add_parser("collect-lst")
    p.add_argument("directory")
    p.add_argument("output")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--activity-threshold", type=float, default=0.6)
    p.add_argument("--min-seconds", type=float, default=3.0)
    p.add_argument("--check-clipping", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    p.set_defaults(fn=collect_lst)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
