"""Experiment engine: the epoch loop with validation, checkpointing, and
best-model gating (reference BaseTrainer, audio_zen/trainer/base_trainer.py,
+ Trainer_Finetune, fullsubnet_plus/trainer/trainer.py:307-444).

One trainer class covers the reference's Trainer/Trainer_Finetune surface:
the per-step math lives in train/step.py; this class owns the loop,
rank-0-only side effects (checkpoints, logs, TensorBoard), and the
validation score gate (mean of STOI and normalized WB-PESQ on the no-reverb
split, base_trainer.py:296-302).
"""

from __future__ import annotations

import json
import os
import signal
import threading
import traceback
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_plus_tpu.eval.metrics import (
    compute_metric,
    metric_available,
    validation_score,
)
from fullsubnet_plus_tpu.io.checkpoint import CheckpointManager
from fullsubnet_plus_tpu.train.step import (
    TrainState,
    init_train_state,
    make_bucketed_eval_step,
    make_eval_step,
    make_train_step,
    make_optimizer,
)
from fullsubnet_plus_tpu.utils import logger


def _np_magspec(y, n_fft: int = 512, hop: int = 256) -> np.ndarray:
    """[F, T] magnitude spectrogram on the HOST for TB figures. Pure numpy
    by design — see the call site in spec_audio_visualization."""
    y = np.pad(np.asarray(y, np.float64).reshape(-1), n_fft // 2, mode="reflect")
    n = max(1 + (len(y) - n_fft) // hop, 1)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    frames = y[idx] * np.hanning(n_fft + 1)[:-1][None, :]  # periodic Hann
    return np.abs(np.fft.rfft(frames, axis=1)).T


class Trainer:
    def __init__(
        self,
        model_def,
        model_config,
        *,
        save_dir: str,
        train_loader=None,
        valid_dataset=None,
        loss_fn=None,
        optimizer=None,
        acoustics: dict | None = None,
        epochs: int = 9999,
        save_checkpoint_interval: int = 1,
        validation_interval: int = 1,
        validation_metrics=("STOI", "SI_SDR"),
        metric_workers: int = 4,
        valid_batch_size: int = 8,
        valid_num_buckets: int = 2,
        save_max_metric_score: bool = True,
        mesh=None,
        compute_dtype=None,
        remat: bool = False,
        seed: int = 0,
        is_primary: bool = True,
        use_tensorboard: bool = True,
        handle_preemption: bool = True,
        heartbeat_interval: int = 50,
        lr: float | None = None,
    ):
        from fullsubnet_plus_tpu.train.loss import mse_loss

        self.model_def = model_def
        self.model_config = model_config
        self.train_loader = train_loader
        self.valid_dataset = valid_dataset
        self.loss_fn = loss_fn or mse_loss
        self.optimizer = optimizer or make_optimizer()
        ac = acoustics or {}
        self.acoustics = dict(
            n_fft=ac.get("n_fft", 512),
            hop_length=ac.get("hop_length", 256),
            win_length=ac.get("win_length", 512),
        )
        self.sr = ac.get("sr", 16000)
        self.epochs = epochs
        self.save_checkpoint_interval = save_checkpoint_interval
        self.validation_interval = validation_interval
        self.validation_metrics = [
            m for m in validation_metrics if metric_available(m)
        ]
        self.metric_workers = metric_workers
        # Bucketed validation (valid_batch_size > 0): utterances are sorted
        # by length into `valid_num_buckets` buckets, zero-padded to each
        # bucket's max length, and evaluated length-masked at this batch
        # size — ≤ valid_num_buckets compiled XLA programs total instead of
        # one per distinct utterance length, and the chip runs full batches
        # instead of batch 1 (the reference's per-utterance pattern,
        # trainer.py:383). Set valid_batch_size=0 for the per-utterance path.
        if mesh is not None and valid_batch_size:
            data_size = mesh.shape.get("data", 1)
            valid_batch_size = -(-valid_batch_size // data_size) * data_size
        self.valid_batch_size = valid_batch_size
        self.valid_num_buckets = max(1, valid_num_buckets)
        self.save_max_metric_score = save_max_metric_score
        self.is_primary = is_primary

        self.ckpt = CheckpointManager(save_dir, is_primary=is_primary, lr=lr)
        self.save_dir = save_dir
        self.start_epoch = 1
        self.best_score = -np.inf if save_max_metric_score else np.inf

        # -- failure detection / preemption safety (capabilities the
        # reference lacks, SURVEY.md §5: its recovery story is a manual -R
        # resume). A SIGTERM/SIGINT (preemption notice) sets a flag; the
        # epoch loop checkpoints at the next step boundary and exits
        # cleanly, so `-R` resumes with at most one epoch's steps lost.
        # Non-finite steps are rejected ON DEVICE (train/step.py
        # skip_nonfinite) and counted here; a heartbeat JSON is rewritten
        # every `heartbeat_interval` steps for external watchdogs.
        self.heartbeat_interval = max(1, heartbeat_interval)
        self.skipped_steps = 0
        self._global_step = 0
        self._preempted = False
        self._prev_handlers = {}
        # Handlers are installed at train() ENTRY (not here) so a Trainer
        # used only for resume()/inspection never hijacks Ctrl+C, and every
        # train() call gets its own install/restore pair.
        self._handle_preemption = handle_preemption

        import jax.numpy as jnp

        dtype = {None: jnp.float32, "float32": jnp.float32,
                 "bfloat16": jnp.bfloat16}.get(compute_dtype, jnp.float32)
        self.train_step = make_train_step(
            model_def, model_config, self.optimizer, self.loss_fn,
            compute_dtype=dtype, mesh=mesh, remat=remat, **self.acoustics,
        )
        self.eval_step = make_eval_step(
            model_def, model_config, self.loss_fn, **self.acoustics
        )
        self.bucketed_eval_step = make_bucketed_eval_step(
            model_def, model_config, self.loss_fn, mesh=mesh, **self.acoustics
        )

        self.mesh = mesh
        params = model_def.init(jax.random.PRNGKey(seed), model_config)
        self.state = init_train_state(params, self.optimizer)
        if mesh is not None:
            from fullsubnet_plus_tpu.parallel import replicated

            self.state = jax.device_put(self.state, replicated(mesh))

        self.writer = None
        self.visualization_n_samples = 3
        if use_tensorboard and is_primary:
            # Our own event writer (utils/tb_events.py): dependency-free —
            # no tensorboardX/protobuf import, no background flush thread,
            # audio without soundfile.
            from fullsubnet_plus_tpu.utils.tb_events import EventWriter

            self.writer = EventWriter(os.path.join(save_dir, "logs"))

    def spec_audio_visualization(self, noisy, enhanced, clean, name, epoch,
                                 mark=""):
        """TB audio + magma spectrogram triptych for a validation sample
        (base_trainer.py:236-261)."""
        if self.writer is None:
            return
        try:  # visualization must never break training (also below)
            self.writer.add_audio(f"{mark}_Speech/{name}_Noisy", noisy, epoch,
                                  sample_rate=self.sr)
            self.writer.add_audio(f"{mark}_Speech/{name}_Enhanced", enhanced,
                                  epoch, sample_rate=self.sr)
            self.writer.add_audio(f"{mark}_Speech/{name}_Clean", clean, epoch,
                                  sample_rate=self.sr)
        except Exception:
            pass
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(3, 1, figsize=(6, 6))
            for ax, (label, y) in zip(
                axes, (("Noisy", noisy), ("Enhanced", enhanced), ("Clean", clean))
            ):
                # Numpy, NOT dsp.stft: dispatching a device program from
                # inside the validation loop compiles a fresh XLA program
                # per utterance length, and on the axon backend that
                # mid-epoch dispatch wedges the client — every subsequent
                # transfer fails UNIMPLEMENTED (measured; the try/except
                # can't contain a poisoned backend). A picture needs no MXU.
                mag = _np_magspec(y)
                ax.imshow(
                    20 * np.log10(mag + 1e-8), origin="lower", aspect="auto",
                    cmap="magma",
                )
                ax.set_title(label)
            fig.tight_layout()
            self.writer.add_figure(f"{mark}_Spectrogram/{name}", fig, epoch)
            plt.close(fig)
        except Exception:
            pass  # visualization must never break training

    # -- checkpoint plumbing -----------------------------------------------

    def resume(self):
        """-R: restore full state from latest_model.npz (base_trainer.py:128-157)."""
        self.state, epoch, self.best_score = self.ckpt.resume(self.state)
        self.start_epoch = epoch + 1
        logger.log(f"Resumed from epoch {epoch} (best={self.best_score:.4f})")

    def preload(self, path: str):
        """-P: weights-only warm start (base_trainer.py:111-126)."""
        params = self.ckpt.preload_params(path, self.state.params)
        self.state = TrainState(params, self.state.opt_state, self.state.step)
        logger.log(f"Preloaded model weights from {path}")

    def resume_from_torch(self, path: str):
        """--from-torch: continue a reference (PyTorch) training run here.

        Full `_resume_checkpoint` semantics (base_trainer.py:128-157): the
        .tar's weights AND Adam moments/step are imported, so training
        continues the same optimizer trajectory rather than restarting it.
        """
        from fullsubnet_plus_tpu.io.checkpoint import (
            find_adam_state,
            load_torch_checkpoint,
        )

        params, opt_state, meta = load_torch_checkpoint(
            path, self.model_def.name, optimizer=self.optimizer
        )
        adam = find_adam_state(opt_state)
        # int() forces a FRESH device buffer for the step counter —
        # jnp.asarray(adam.count) would alias the opt_state's own count
        # array, and the donated train step then aborts with "Attempt to
        # donate the same buffer twice" on the first step.
        step = int(adam.count) if adam is not None else int(self.state.step)
        state = TrainState(params, opt_state, jnp.asarray(step, jnp.int32))
        if self.mesh is not None:
            from fullsubnet_plus_tpu.parallel import replicated

            state = jax.device_put(state, replicated(self.mesh))
        self.state = jax.tree.map(jnp.asarray, state)
        if "epoch" in meta:
            self.start_epoch = meta["epoch"] + 1
        if "best_score" in meta:
            self.best_score = meta["best_score"]
        logger.log(
            f"Resumed from torch checkpoint {path} "
            f"(epoch={meta.get('epoch')}, step={int(step)})"
        )

    # -- failure detection / preemption -------------------------------------

    def _on_preempt(self, signum, frame):
        del frame
        self._preempted = True
        logger.log(f"Signal {signum} received: will checkpoint and exit at "
                   "the next step boundary")

    def _write_heartbeat(self, epoch: int, loss: float):
        if not self.is_primary:
            return
        loss = float(loss)
        beat = {
            "epoch": epoch,
            "global_step": self._global_step,
            # strict JSON: bare NaN/Inf would break jq/Go/Rust watchdogs
            "loss": loss if np.isfinite(loss) else None,
            "skipped_steps": self.skipped_steps,
            "time": time.time(),
        }
        # ckpt.save_dir is the expanduser/abspath-normalized form
        path = os.path.join(self.ckpt.save_dir, "heartbeat.json")
        tmp = path + ".tmp"
        try:
            with open(tmp, "w") as f:
                json.dump(beat, f)
            os.replace(tmp, path)  # atomic: watchdogs never see a torn file
        except OSError:
            pass  # observability must never break training

    def _is_best(self, score: float) -> bool:
        """base_trainer.py:202-213."""
        if self.save_max_metric_score and score >= self.best_score:
            self.best_score = score
            return True
        if not self.save_max_metric_score and score <= self.best_score:
            self.best_score = score
            return True
        return False

    # -- loop ---------------------------------------------------------------

    def _mark_complete(self):
        """Write the run-completion marker the supervisor keys on
        (train/supervisor.py): the recovery paths exit 0 on purpose, so an
        exit code cannot distinguish "finished" from "checkpointed for -R"."""
        if not self.is_primary:
            return
        path = os.path.join(self.ckpt.save_dir, "run_complete.json")
        with open(path + ".tmp", "w") as f:
            json.dump({"epochs": self.epochs, "time": time.time()}, f)
        os.replace(path + ".tmp", path)

    def train(self, only_validation: bool = False):
        self._preempted = False
        if self.is_primary:  # stale marker from a previous completed run
            try:
                os.unlink(os.path.join(self.ckpt.save_dir, "run_complete.json"))
            except OSError:
                pass
        if (
            self._handle_preemption
            and threading.current_thread() is threading.main_thread()
        ):
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    self._prev_handlers[sig] = signal.signal(sig, self._on_preempt)
                except (ValueError, OSError):
                    pass
        try:
            self._train_loop(only_validation)
        finally:
            # Give the signals back to whoever owned them (keeps repeated
            # Trainer construction in one process — tests, notebooks — sane).
            for sig, handler in self._prev_handlers.items():
                try:
                    signal.signal(sig, handler)
                except (ValueError, OSError):
                    pass
            self._prev_handlers = {}

    def _validation_score(self, epoch: int) -> float:
        """Validation with the reference's rank-0-only work pattern
        (base_trainer.py:328-339): in multi-host runs only the primary host
        evaluates — the others would duplicate the whole epoch — and the
        score is broadcast so every host's best_score state stays
        consistent. A primary-side failure broadcasts NaN, so non-primary
        hosts raise the same error instead of hanging in the collective."""
        if jax.process_count() == 1:
            return self._validation_epoch(epoch)
        from jax.experimental import multihost_utils

        score = np.float32(np.nan)
        if self.is_primary:
            try:
                score = np.float32(self._validation_epoch(epoch))
            except Exception:
                logger.log(
                    f"[Val] epoch {epoch} failed on the primary host:\n"
                    f"{traceback.format_exc()}"
                )
        out = float(multihost_utils.broadcast_one_to_all(score))
        if np.isnan(out):
            raise RuntimeError(
                f"validation epoch {epoch} failed on the primary host"
            )
        return out

    def _train_loop(self, only_validation: bool = False):
        for epoch in range(self.start_epoch, self.epochs + 1):
            if only_validation:
                score = self._validation_score(epoch)
                # _is_best must run BEFORE best_score is read (it updates it);
                # argument order here previously saved the stale pre-update
                # value, which a later -R resume would restore. All hosts run
                # _is_best (keeps best_score state consistent) but only the
                # primary writes — a multi-host -V run must not have every
                # process racing on latest/best checkpoint files.
                is_best = self._is_best(score)
                if self.is_primary:
                    self.ckpt.save(self.state, epoch, self.best_score, is_best)
                self._mark_complete()
                return
            t0 = time.time()
            try:
                train_loss = self._train_epoch(epoch)
            except jax.errors.JaxRuntimeError:
                # A dead backend mid-epoch (device lost, runtime wedged)
                # should leave a resumable run, not a stack trace: best-
                # effort checkpoint of the last completed epoch and a clean
                # exit so `-R` continues. Programming errors (shape/type
                # bugs) are NOT JaxRuntimeError and still propagate.
                logger.log(
                    f"[Train] epoch {epoch} ABORTED by a backend runtime "
                    f"error — checkpointing and exiting for -R resume:\n"
                    f"{traceback.format_exc()}"
                )
                if self.is_primary:
                    try:
                        self.ckpt.save(self.state, epoch - 1, self.best_score,
                                       latest_only=True)
                    except Exception:
                        logger.log(
                            "[Train] checkpoint-on-failure also failed "
                            "(device unreachable); resume from the last "
                            f"epoch file:\n{traceback.format_exc()}"
                        )
                return
            logger.log(
                f"[Train] epoch {epoch} loss {train_loss:.6f} "
                f"({time.time() - t0:.1f}s)"
            )
            if self.writer:
                self.writer.add_scalar("Loss/Train", train_loss, epoch)

            if self._preempted:
                # Preemption checkpoint: the interrupted epoch is NOT counted
                # as completed (saved as epoch-1), so -R resume replays it.
                # latest_only: don't clobber epoch-1's real per-epoch file.
                if self.is_primary:
                    self.ckpt.save(self.state, epoch - 1, self.best_score,
                                   latest_only=True)
                    self._write_heartbeat(epoch, train_loss)
                logger.log(f"Preempted during epoch {epoch}: checkpoint "
                           "written, exiting cleanly (resume with -R)")
                return

            if self.is_primary and epoch % self.save_checkpoint_interval == 0:
                self.ckpt.save(self.state, epoch, self.best_score)
            if epoch % self.validation_interval == 0 and self.valid_dataset is not None:
                # Validation failures (e.g. a transient remote-compile /
                # backend error) must not kill a long training run — the
                # epoch checkpoint is already on disk. Log, skip the best
                # gate this round, keep training. Part of the failure-
                # detection story (ARCHITECTURE.md) — the reference dies.
                try:
                    score = self._validation_score(epoch)
                except Exception:
                    logger.log(
                        f"[Val] epoch {epoch} FAILED — continuing training:\n"
                        f"{traceback.format_exc()}"
                    )
                    continue
                if self.is_primary and self._is_best(score):
                    self.ckpt.save(self.state, epoch, self.best_score, is_best=True)
        # Reached only when every epoch ran to the end — the early returns
        # (preemption, dead backend) deliberately skip the marker.
        self._mark_complete()

    def _train_epoch(self, epoch: int) -> float:
        from fullsubnet_plus_tpu.parallel.mesh import globalize_batch

        # Dispatch steps back-to-back and keep a bounded window of
        # un-fetched loss scalars: fetching the loss synchronously every
        # step costs a full host<->device round trip (~25 ms over the axon
        # tunnel — more than a third of the 48 ms bf16 step itself, see
        # docs/PERFORMANCE.md). The state-chain dependency keeps device
        # execution correctly serialized; the window bound keeps the host
        # from racing more than a few batches ahead of the device.
        window = 8
        pending: list = []
        loss_total, n_counted, n = 0.0, 0, 0
        last_loss = 0.0

        def drain(one=True):
            nonlocal loss_total, n_counted, last_loss
            while pending and (len(pending) > window if one else True):
                loss, skipped = pending.pop(0)
                loss = float(loss)
                if skipped is not None and float(skipped) > 0:
                    # Rejected step: its NaN/Inf loss must not poison the
                    # epoch mean or the heartbeat.
                    self.skipped_steps += 1
                    logger.log(
                        f"[Guard] non-finite step rejected on device "
                        f"(epoch {epoch}, total skipped {self.skipped_steps})"
                    )
                else:
                    loss_total += loss
                    n_counted += 1
                    last_loss = loss
                if one:
                    return
            return

        for noisy, clean in self.train_loader.epoch(epoch):
            if self.mesh is not None and jax.process_count() > 1:
                noisy, clean = globalize_batch(self.mesh, noisy, clean)
            self.state, metrics = self.train_step(self.state, noisy, clean)
            pending.append((metrics["loss"], metrics.get("skipped")))
            n += 1
            self._global_step += 1
            drain()
            if self._global_step % self.heartbeat_interval == 0:
                self._write_heartbeat(epoch, last_loss)
            if self._preempted:
                break
        drain(one=False)
        return loss_total / max(n_counted, 1)

    def _validation_epoch(self, epoch: int) -> float:
        """Validation epoch, split by speech type (trainer.py:364-444).
        Returns the no-reverb gate score. Bucketed by default — see
        _validation_epoch_bucketed; valid_batch_size=0 selects the
        reference-shaped per-utterance loop."""
        if self.valid_batch_size:
            return self._validation_epoch_bucketed(epoch)
        return self._validation_epoch_per_utterance(epoch)

    def _validation_epoch_bucketed(self, epoch: int) -> float:
        """Length-bucketed, batched, mesh-aware validation.

        Utterances are sorted by length into valid_num_buckets buckets; each
        bucket is zero-padded to its own max length and evaluated in fixed
        valid_batch_size batches through the length-masked eval step
        (train/step.py make_bucketed_eval_step) — at most valid_num_buckets
        compiled programs, reused across epochs, each row numerically
        matching its exact-length batch-1 run. Partial final batches are
        filled by repeating the first row (well-defined statistics; the
        duplicate outputs are dropped)."""
        t0 = time.time()
        n = len(self.valid_dataset)
        items = [self.valid_dataset[i] for i in range(n)]
        lengths = np.array([len(it[0]) for it in items], np.int64)
        order = np.argsort(lengths, kind="stable")
        per_bucket = -(-n // self.valid_num_buckets)
        batch = self.valid_batch_size

        loss_by_type: dict = {}
        pairs_by_type: dict = {}
        for b0 in range(0, n, per_bucket):
            bucket = order[b0 : b0 + per_bucket]
            bucket_len = int(lengths[bucket].max())
            for s0 in range(0, len(bucket), batch):
                group = bucket[s0 : s0 + batch]
                noisy_b = np.zeros((batch, bucket_len), np.float32)
                clean_b = np.zeros((batch, bucket_len), np.float32)
                lens_b = np.empty((batch,), np.int32)
                for j in range(batch):
                    src = group[j] if j < len(group) else group[0]
                    L = int(lengths[src])
                    noisy_b[j, :L] = items[src][0]
                    clean_b[j, :L] = items[src][1]
                    lens_b[j] = L
                losses, enhanced = self.bucketed_eval_step(
                    self.state.params, noisy_b, clean_b, lens_b
                )
                losses = np.asarray(losses)
                enhanced = np.asarray(enhanced)
                for j, src in enumerate(group):
                    noisy_i, clean_i, name, speech_type = items[src]
                    enh = enhanced[j, : int(lengths[src])]
                    loss_by_type.setdefault(speech_type, []).append(
                        float(losses[j])
                    )
                    if (
                        len(pairs_by_type.get(speech_type, ()))
                        < self.visualization_n_samples
                    ):
                        self.spec_audio_visualization(
                            noisy_i, enh, clean_i, name, epoch, mark=speech_type
                        )
                    pairs_by_type.setdefault(speech_type, []).append(
                        (clean_i, enh)
                    )
        logger.log(
            f"[Val] epoch {epoch} bucketed eval: {n} utterances, "
            f"{self.valid_num_buckets} bucket(s) x batch {batch}, "
            f"{time.time() - t0:.1f}s"
        )
        return self._score_splits(loss_by_type, pairs_by_type, epoch)

    def _validation_epoch_per_utterance(self, epoch: int) -> float:
        """The reference-shaped loop: one utterance per step at its natural
        length (trainer.py:364-444) — every distinct length is a fresh XLA
        compile, so this is only for tiny corpora / A-B verification."""
        loss_by_type: dict = {}
        pairs_by_type: dict = {}
        for i in range(len(self.valid_dataset)):
            noisy, clean, name, speech_type = self.valid_dataset[i]
            loss, enhanced = self.eval_step(
                self.state.params, noisy[None], clean[None]
            )
            enhanced = np.asarray(enhanced[0])
            loss_by_type.setdefault(speech_type, []).append(float(loss))
            if len(pairs_by_type.get(speech_type, ())) < self.visualization_n_samples:
                self.spec_audio_visualization(
                    noisy, enhanced, clean, name, epoch, mark=speech_type
                )
            pairs_by_type.setdefault(speech_type, []).append((clean, enhanced))
        return self._score_splits(loss_by_type, pairs_by_type, epoch)

    def _score_splits(self, loss_by_type: dict, pairs_by_type: dict,
                      epoch: int) -> float:
        """CPU metrics + TB scalars per split, then the best-model gate."""
        scores: dict = {}
        for speech_type, pairs in pairs_by_type.items():
            mean_loss = float(np.mean(loss_by_type[speech_type]))
            logger.log(f"[Val] epoch {epoch} {speech_type} loss {mean_loss:.6f}")
            if self.writer:
                self.writer.add_scalar(f"Loss/{speech_type}", mean_loss, epoch)
            means = {}
            with ThreadPoolExecutor(max_workers=self.metric_workers) as ex:
                for metric in self.validation_metrics:
                    vals = list(
                        ex.map(
                            lambda p: compute_metric(metric, p[0], p[1], sr=self.sr),
                            pairs,
                        )
                    )
                    means[metric] = float(np.mean(vals))
                    logger.log(
                        f"[Val] epoch {epoch} {speech_type} {metric} {means[metric]:.4f}"
                    )
                    if self.writer:
                        self.writer.add_scalar(
                            f"{metric}/{speech_type}", means[metric], epoch
                        )
            scores[speech_type] = validation_score(means) if means else -np.inf
        return self._gate_score(scores)

    def _gate_score(self, scores: dict) -> float:
        """The best-model gate is the No_reverb split's score, looked up
        explicitly like the reference (trainer.py:444 indexes
        validation_score_list["No_reverb"]). When the split is absent
        (custom corpora) we fall back to the first split LOUDLY instead of
        raising — a legitimate 0.0 No_reverb score must gate as 0.0, never
        be overwritten by a later split (the old ==0.0 sentinel bug)."""
        if not scores:
            return -np.inf
        if "No_reverb" in scores:
            return scores["No_reverb"]
        speech_type, score = next(iter(scores.items()))
        logger.log(
            f"[Val] WARNING: no No_reverb split in {sorted(scores)}; "
            f"best-model gate falling back to {speech_type!r}"
        )
        return score
