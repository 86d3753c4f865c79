"""Failure detection and preemption safety — capabilities beyond the
reference (SURVEY.md §5 lists failure detection/elastic recovery as absent
there; its recovery story is a manual -R resume):

  * on-device non-finite-step rejection (train/step.py skip_nonfinite),
  * SIGTERM/SIGINT preemption -> checkpoint at the next step boundary,
  * heartbeat.json for external watchdogs.
"""

import json
import os
import signal

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from fullsubnet_plus_tpu.train.loss import mse_loss
from fullsubnet_plus_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

TINY = FullSubNetPlusConfig(
    num_freqs=33, sb_num_neighbors=4, fb_model_hidden_size=16,
    sb_model_hidden_size=16,
)
ACOUSTICS = dict(n_fft=64, hop_length=32, win_length=64)


def _tiny_step_and_state(skip_nonfinite=True):
    optimizer = make_optimizer()
    state = init_train_state(
        FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), TINY), optimizer
    )
    step = make_train_step(
        FULLSUBNET_PLUS, TINY, optimizer, mse_loss,
        skip_nonfinite=skip_nonfinite, **ACOUSTICS,
    )
    return step, state


def test_nonfinite_step_rejected():
    """A NaN batch must leave params AND optimizer moments untouched (the
    step counter still advances), and report metrics['skipped'] == 1."""
    step, state = _tiny_step_and_state()
    rng = np.random.default_rng(0)
    noisy = (rng.standard_normal((4, 2048)) * 0.1).astype(np.float32)
    clean = (0.8 * noisy).astype(np.float32)

    params_before = jax.tree_util.tree_map(np.asarray, state.params)
    bad = clean.copy()
    bad[0, 100] = np.nan
    state2, metrics = step(state, noisy, bad)
    assert float(metrics["skipped"]) == 1.0
    assert not np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1  # counter advances; update rejected
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state2.params, params_before,
    )

    # A clean batch right after still learns.
    state3, metrics = step(state2, noisy, clean)
    assert float(metrics["skipped"]) == 0.0
    assert np.isfinite(float(metrics["loss"]))
    changed = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or bool(np.any(pair)),
        jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) != b, state3.params, params_before
        ),
        False,
    )
    assert changed, "finite step after a rejected one must update params"


def test_finite_step_bit_identical_with_guard():
    """With finite inputs the guarded step must equal the unguarded one."""
    step_g, state_g = _tiny_step_and_state(skip_nonfinite=True)
    step_u, state_u = _tiny_step_and_state(skip_nonfinite=False)
    rng = np.random.default_rng(1)
    noisy = (rng.standard_normal((4, 2048)) * 0.1).astype(np.float32)
    clean = (0.8 * noisy).astype(np.float32)
    state_g, mg = step_g(state_g, noisy, clean)
    state_u, mu = step_u(state_u, noisy, clean)
    assert float(mg["loss"]) == float(mu["loss"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state_g.params, state_u.params,
    )


class _PreemptingLoader:
    """Yields batches and delivers SIGTERM to the process mid-epoch."""

    def __init__(self, n_batches=6, preempt_at=2):
        rng = np.random.default_rng(0)
        self.noisy = (rng.standard_normal((4, 2048)) * 0.1).astype(np.float32)
        self.clean = (0.8 * self.noisy).astype(np.float32)
        self.n_batches = n_batches
        self.preempt_at = preempt_at
        self.batches_served = 0

    def epoch(self, epoch):
        for i in range(self.n_batches):
            if i == self.preempt_at:
                os.kill(os.getpid(), signal.SIGTERM)
            self.batches_served += 1
            yield self.noisy, self.clean


def test_preemption_checkpoints_and_exits(tmp_path):
    from fullsubnet_plus_tpu.io.checkpoint import load_flat
    from fullsubnet_plus_tpu.train.trainer import Trainer

    loader = _PreemptingLoader()
    trainer = Trainer(
        FULLSUBNET_PLUS, TINY,
        save_dir=str(tmp_path),
        train_loader=loader,
        acoustics=dict(**ACOUSTICS, sr=16000),
        epochs=3,
        use_tensorboard=False,
        heartbeat_interval=1,
    )
    trainer.train()  # must return (not hang, not die) on the SIGTERM

    # The interrupted epoch is saved as epoch-1 so -R replays it.
    latest = os.path.join(str(tmp_path), "checkpoints", "latest_model.npz")
    assert os.path.exists(latest)
    _, meta = load_flat(latest)
    assert meta["epoch"] == 0
    # Mid-epoch stop: fewer batches than a full run would have served.
    assert loader.batches_served < loader.n_batches

    beat = json.load(open(os.path.join(str(tmp_path), "heartbeat.json")))
    assert beat["global_step"] >= 1 and beat["skipped_steps"] == 0

    # The handler was restored on exit.
    assert signal.getsignal(signal.SIGTERM) not in (trainer._on_preempt,)

    # And -R resume restores cleanly into a fresh trainer.
    trainer2 = Trainer(
        FULLSUBNET_PLUS, TINY,
        save_dir=str(tmp_path),
        train_loader=loader,
        acoustics=dict(**ACOUSTICS, sr=16000),
        epochs=3,
        use_tensorboard=False,
    )
    trainer2.resume()
    assert trainer2.start_epoch == 1
    for sig, h in trainer2._prev_handlers.items():
        signal.signal(sig, h)


def test_handlers_only_installed_during_train(tmp_path):
    """Constructing a Trainer (e.g. for resume()/inspection) must NOT hijack
    SIGTERM/SIGINT; only train() installs handlers, and it restores them."""
    from fullsubnet_plus_tpu.train.trainer import Trainer

    before = signal.getsignal(signal.SIGTERM)
    trainer = Trainer(
        FULLSUBNET_PLUS, TINY,
        save_dir=str(tmp_path),
        train_loader=None,
        use_tensorboard=False,
    )
    assert signal.getsignal(signal.SIGTERM) is before
    assert trainer._prev_handlers == {}


class _TinyLoader:
    def __init__(self, n_batches=2):
        rng = np.random.default_rng(0)
        self.noisy = (rng.standard_normal((4, 2048)) * 0.1).astype(np.float32)
        self.clean = (0.8 * self.noisy).astype(np.float32)
        self.n_batches = n_batches

    def epoch(self, epoch):
        for _ in range(self.n_batches):
            yield self.noisy, self.clean


def test_validation_failure_does_not_kill_training(tmp_path):
    """A transient backend error in the validation epoch must not abort the
    run (observed on hardware: a remote-compile flake killed a training run
    whose epoch checkpoints were already on disk)."""
    from fullsubnet_plus_tpu.train.trainer import Trainer

    class _FailingValDataset:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            raise RuntimeError("synthetic validation failure")

    trainer = Trainer(
        FULLSUBNET_PLUS, TINY,
        save_dir=str(tmp_path),
        train_loader=_TinyLoader(),
        valid_dataset=_FailingValDataset(),
        acoustics=dict(**ACOUSTICS, sr=16000),
        epochs=2,
        validation_interval=1,
        use_tensorboard=False,
    )
    trainer.train()  # must complete both epochs despite failing validation

    ckpts = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert "model_0002.npz" in ckpts
    assert "best_model.npz" not in ckpts  # gate never ran


def test_backend_failure_checkpoints_and_exits(tmp_path):
    """A backend runtime error mid-training leaves a resumable checkpoint
    and exits cleanly (observed on hardware: a wedged device connection
    failed every dispatch after the first error)."""
    from fullsubnet_plus_tpu.io.checkpoint import load_flat
    from fullsubnet_plus_tpu.train.trainer import Trainer

    trainer = Trainer(
        FULLSUBNET_PLUS, TINY,
        save_dir=str(tmp_path),
        train_loader=_TinyLoader(),
        acoustics=dict(**ACOUSTICS, sr=16000),
        epochs=4,
        use_tensorboard=False,
    )
    real_step = trainer.train_step
    calls = {"n": 0}

    def flaky_step(state, noisy, clean):
        calls["n"] += 1
        if calls["n"] > 2:  # epoch 2, first batch
            raise jax.errors.JaxRuntimeError("UNIMPLEMENTED: synthetic")
        return real_step(state, noisy, clean)

    trainer.train_step = flaky_step
    trainer.train()  # returns cleanly instead of raising

    latest = os.path.join(str(tmp_path), "checkpoints", "latest_model.npz")
    _, meta = load_flat(latest)
    assert meta["epoch"] == 1  # interrupted epoch 2 -> resumable from 1


def test_only_validation_saves_updated_best(tmp_path):
    """-V checkpoints must carry the POST-update best score (regression:
    argument evaluation order read self.best_score before _is_best updated
    it, so a later -R restored -inf and any score became 'best')."""
    from fullsubnet_plus_tpu.io.checkpoint import load_flat
    from fullsubnet_plus_tpu.train.trainer import Trainer

    trainer = Trainer(
        FULLSUBNET_PLUS, TINY,
        save_dir=str(tmp_path),
        train_loader=None,
        acoustics=dict(**ACOUSTICS, sr=16000),
        epochs=1,
        use_tensorboard=False,
    )
    trainer._validation_epoch = lambda epoch: 0.5
    trainer.train(only_validation=True)

    ckpt_dir = os.path.join(str(tmp_path), "checkpoints")
    _, meta = load_flat(os.path.join(ckpt_dir, "latest_model.npz"))
    assert meta["best_score"] == 0.5
    assert os.path.exists(os.path.join(ckpt_dir, "best_model.npz"))
