"""Measure the bucketed validation epoch's wall time on the real chip
(docs/PERFORMANCE.md "Bucketed validation"; VERDICT r1 item 1's deliverable).

Synthesizes a DNS-shaped validation corpus (30 utterances, 3-10 s, two
speech types), runs the full-size FullSubNet+ through the trainer's
bucketed validation path, and reports cold (compiles included) and warm
epoch wall times. The reference-shaped per-utterance loop is NOT measured
on the chip: 30 distinct lengths would mean 30 remote XLA compiles at
minutes each over the axon tunnel — which is precisely the pathology the
bucketed path removes (its CPU-side equivalence is pinned by
tests/test_validation.py).

    python scripts/measure_validation.py [--utts 30] [--batch 8] [--buckets 2]
"""

import argparse
import time

import numpy as np


class SyntheticValDataset:
    def __init__(self, n, sr=16000, seed=0):
        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            L = int(sr * rng.uniform(3.0, 10.0))
            clean = (0.1 * rng.standard_normal(L)).astype(np.float32)
            noisy = (clean + 0.05 * rng.standard_normal(L)).astype(np.float32)
            st = "No_reverb" if i % 2 == 0 else "With_reverb"
            self.items.append((noisy, clean, f"utt{i}", st))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--utts", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--buckets", type=int, default=2)
    p.add_argument("--save-dir", default="/tmp/val_measure")
    args = p.parse_args()

    from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
    from fullsubnet_plus_tpu.train.trainer import Trainer

    ds = SyntheticValDataset(args.utts)
    audio_s = sum(len(it[0]) for it in ds.items) / 16000
    trainer = Trainer(
        FULLSUBNET_PLUS, FullSubNetPlusConfig(),
        save_dir=args.save_dir,
        train_loader=None,
        valid_dataset=ds,
        validation_metrics=("SI_SDR",),
        valid_batch_size=args.batch,
        valid_num_buckets=args.buckets,
        use_tensorboard=False,
    )
    print(f"{args.utts} utterances, {audio_s:.0f} audio-s, "
          f"platform={jax.devices()[0].platform}")
    for label in ("cold (compiles included)", "warm", "warm"):
        t0 = time.perf_counter()
        score = trainer._validation_epoch(1)
        wall = time.perf_counter() - t0
        print(f"{label}: {wall:.1f}s wall, {audio_s / wall:.0f} audio-s/s, "
              f"gate={score:.4f}")


if __name__ == "__main__":
    main()
