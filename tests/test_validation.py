"""Validation-epoch tests: the best-model gate's explicit No_reverb lookup
(reference trainer.py:444) and the bucketed, length-masked validation path
(train/step.py make_bucketed_eval_step) matching the reference-shaped
per-utterance loop.
"""

import os

import jax
import numpy as np
import pytest

from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from fullsubnet_plus_tpu.train.trainer import Trainer

TINY = FullSubNetPlusConfig(
    num_freqs=33, sb_num_neighbors=4, fb_model_hidden_size=16,
    sb_model_hidden_size=16,
)
ACOUSTICS = dict(n_fft=64, hop_length=32, win_length=64, sr=16000)


# -- best-model gate (regression for the ==0.0 sentinel bug) -----------------


def test_gate_score_zero_no_reverb_not_overwritten():
    """A legitimate 0.0 No_reverb score must gate as 0.0 — the old sentinel
    let a later split overwrite it."""
    scores = {"No_reverb": 0.0, "With_reverb": 0.9}
    assert Trainer._gate_score(None, scores) == 0.0


def test_gate_score_explicit_no_reverb_lookup():
    scores = {"With_reverb": 0.4, "No_reverb": 0.7, "Singing": 0.95}
    assert Trainer._gate_score(None, scores) == 0.7


def test_gate_score_fallback_when_no_reverb_absent():
    """Custom corpora without a No_reverb split fall back to the first split
    (insertion order = dataset order) instead of raising like the reference's
    hard ["No_reverb"] index."""
    scores = {"Emotion": 0.3, "Singing": 0.6}
    assert Trainer._gate_score(None, scores) == 0.3
    assert Trainer._gate_score(None, {}) == -np.inf


def test_only_validation_non_primary_writes_no_checkpoint(tmp_path):
    """In a multi-host -V run only the primary writes latest/best files."""
    trainer = Trainer(
        FULLSUBNET_PLUS, TINY,
        save_dir=str(tmp_path),
        train_loader=None,
        acoustics=ACOUSTICS,
        epochs=1,
        use_tensorboard=False,
        is_primary=False,
    )
    trainer._validation_epoch = lambda epoch: 0.5
    trainer.train(only_validation=True)
    ckpt_dir = os.path.join(str(tmp_path), "checkpoints")
    assert not os.path.isdir(ckpt_dir) or not os.listdir(ckpt_dir)
    # best_score state still advanced on every host (kept consistent for -R)
    assert trainer.best_score == 0.5


# -- bucketed validation ------------------------------------------------------


class _SyntheticValDataset:
    """Varying-length utterances across two speech types."""

    def __init__(self, lengths, types):
        rng = np.random.default_rng(3)
        self.items = []
        for i, (L, t) in enumerate(zip(lengths, types)):
            clean = (rng.standard_normal(L) * 0.1).astype(np.float32)
            noisy = (clean + rng.standard_normal(L) * 0.05).astype(np.float32)
            self.items.append((noisy, clean, f"utt{i}", t))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


LENGTHS = [2048, 2500, 3100, 3072, 4096, 5000, 6144]
TYPES = ["No_reverb", "With_reverb", "No_reverb", "With_reverb",
         "No_reverb", "No_reverb", "With_reverb"]


def _make_trainer(tmp_path, **kw):
    return Trainer(
        FULLSUBNET_PLUS, TINY,
        save_dir=str(tmp_path),
        train_loader=None,
        valid_dataset=_SyntheticValDataset(LENGTHS, TYPES),
        acoustics=ACOUSTICS,
        validation_metrics=("SI_SDR",),
        epochs=1,
        use_tensorboard=False,
        **kw,
    )


@pytest.mark.slow
def test_bucketed_validation_matches_per_utterance(tmp_path):
    """Bucketed per-split losses, metric means, and the gate score must match
    the reference-shaped per-utterance loop (VERDICT r1 item 1)."""
    trainer = _make_trainer(tmp_path, valid_batch_size=4, valid_num_buckets=2)

    ref_losses, ref_pairs = {}, {}
    buck_losses, buck_pairs = {}, {}

    def capture(dst_l, dst_p):
        def scorer(loss_by_type, pairs_by_type, epoch):
            dst_l.update(loss_by_type)
            dst_p.update(pairs_by_type)
            return Trainer._score_splits(trainer, loss_by_type, pairs_by_type, epoch)
        return scorer

    orig = trainer._score_splits
    trainer._score_splits = capture(ref_losses, ref_pairs)
    ref_gate = trainer._validation_epoch_per_utterance(1)
    trainer._score_splits = capture(buck_losses, buck_pairs)
    buck_gate = trainer._validation_epoch_bucketed(1)
    trainer._score_splits = orig

    assert set(ref_losses) == set(buck_losses) == {"No_reverb", "With_reverb"}
    for st in ref_losses:
        # order within a split is bucket-permuted; compare as multisets
        np.testing.assert_allclose(
            np.sort(buck_losses[st]), np.sort(ref_losses[st]), rtol=2e-3,
        )
        assert len(buck_pairs[st]) == len(ref_pairs[st])
    np.testing.assert_allclose(buck_gate, ref_gate, rtol=2e-3)

    # enhanced waveforms match the exact-length runs row by row
    ref_by_len = {
        len(c): e for c, e in
        [p for st in ref_pairs for p in ref_pairs[st]]
    }
    for st in buck_pairs:
        for clean, enh in buck_pairs[st]:
            ref_enh = ref_by_len[len(clean)]
            err = np.linalg.norm(enh - ref_enh)
            ref_n = np.linalg.norm(ref_enh) + 1e-12
            assert err / ref_n < 2e-2, (st, len(clean), err / ref_n)


def test_bucketed_eval_step_honors_loss_fn():
    """The per-row masked reduction must reproduce the configured loss_fn
    (not silently MSE): l1 per-row values equal each utterance's
    exact-length eval_step l1."""
    import jax

    from fullsubnet_plus_tpu.train.loss import l1_loss
    from fullsubnet_plus_tpu.train.step import (
        make_bucketed_eval_step,
        make_eval_step,
    )

    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), TINY)
    ac = dict(n_fft=64, hop_length=32, win_length=64)
    eval_step = make_eval_step(FULLSUBNET_PLUS, TINY, l1_loss, **ac)
    bucketed = make_bucketed_eval_step(FULLSUBNET_PLUS, TINY, l1_loss, **ac)

    rng = np.random.default_rng(5)
    lengths = np.array([2048, 3000], np.int32)
    Lp = int(lengths.max())
    noisy = np.zeros((2, Lp), np.float32)
    clean = np.zeros((2, Lp), np.float32)
    for j, L in enumerate(lengths):
        c = (0.1 * rng.standard_normal(L)).astype(np.float32)
        noisy[j, :L] = c + 0.05 * rng.standard_normal(L)
        clean[j, :L] = c
    losses, _ = bucketed(params, noisy, clean, lengths)
    for j, L in enumerate(lengths):
        ref_loss, _ = eval_step(
            params, noisy[j, :L][None], clean[j, :L][None]
        )
        np.testing.assert_allclose(
            float(losses[j]), float(ref_loss), rtol=2e-3,
        )


@pytest.mark.slow
def test_bucketed_validation_compiles_at_most_num_buckets_programs(tmp_path):
    """The whole point: ≤ valid_num_buckets XLA programs for any corpus of
    varying lengths (the per-utterance loop compiles one per length)."""
    trainer = _make_trainer(tmp_path, valid_batch_size=4, valid_num_buckets=2)
    trainer._validation_epoch(1)
    # mesh=None: bucketed_eval_step is the jax.jit object itself
    assert trainer.bucketed_eval_step._cache_size() <= 2
    # a second epoch reuses the cache (no new shapes)
    trainer._validation_epoch(2)
    assert trainer.bucketed_eval_step._cache_size() <= 2
