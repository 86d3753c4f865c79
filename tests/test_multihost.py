"""True multi-process distributed training: two JAX processes (one CPU device
each) run one data-parallel train step over a global mesh; the loss must
match a single-process run on the same global batch.

This exercises the real multi-host path: jax.distributed bootstrap, per-host
batch shards assembled with make_array_from_process_local_data
(parallel.globalize_batch), and the cross-process gradient all-reduce.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # 1 device per process
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=proc_id)
import numpy as np
import jax.numpy as jnp
from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from fullsubnet_plus_tpu.train.loss import mse_loss
from fullsubnet_plus_tpu.train.step import make_optimizer, make_train_step, init_train_state
from fullsubnet_plus_tpu.parallel import make_mesh, replicated
from fullsubnet_plus_tpu.parallel.mesh import globalize_batch

cfg = FullSubNetPlusConfig(num_freqs=33, sb_num_neighbors=4,
                           fb_model_hidden_size=32, sb_model_hidden_size=24)
acoustics = dict(n_fft=64, hop_length=32, win_length=64)
optimizer = make_optimizer()
state = init_train_state(FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), cfg), optimizer)
mesh = make_mesh(data=2, freq=1)
state = jax.device_put(state, replicated(mesh))
step = make_train_step(FULLSUBNET_PLUS, cfg, optimizer, mse_loss, mesh=mesh, **acoustics)

rng = np.random.default_rng(0)
noisy_global = (rng.standard_normal((4, 2048)) * 0.1).astype(np.float32)
clean_global = (0.8 * noisy_global).astype(np.float32)
# this host's shard of the global batch (2 rows each)
lo, hi = proc_id * 2, proc_id * 2 + 2
noisy, clean = globalize_batch(mesh, noisy_global[lo:hi], clean_global[lo:hi])
state, metrics = step(state, noisy, clean)
print(f"LOSS:{float(metrics['loss']):.10f}", flush=True)
"""


VAL_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=proc_id)
import numpy as np
from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from fullsubnet_plus_tpu.train.trainer import Trainer

cfg = FullSubNetPlusConfig(num_freqs=33, sb_num_neighbors=4,
                           fb_model_hidden_size=16, sb_model_hidden_size=16)

class MustNotTouch:
    def __len__(self):
        raise AssertionError("non-primary host evaluated the validation set")
    def __getitem__(self, i):
        raise AssertionError("non-primary host evaluated the validation set")

class TinyVal:
    def __len__(self):
        return 2
    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        clean = (0.1 * rng.standard_normal(2048)).astype(np.float32)
        noisy = (clean + 0.05 * rng.standard_normal(2048)).astype(np.float32)
        return noisy, clean, f"u{i}", "No_reverb"

trainer = Trainer(
    FULLSUBNET_PLUS, cfg,
    save_dir=sys.argv[3],
    train_loader=None,
    valid_dataset=TinyVal() if proc_id == 0 else MustNotTouch(),
    acoustics=dict(n_fft=64, hop_length=32, win_length=64, sr=16000),
    validation_metrics=("SI_SDR",),
    use_tensorboard=False,
    is_primary=(proc_id == 0),
)
score = trainer._validation_score(1)
print(f"SCORE:{score:.10f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_validation_primary_only(tmp_path):
    """Multi-host validation runs on the primary only (reference's rank-0
    pattern, base_trainer.py:328-339); the gate score is broadcast so
    best_score state stays consistent on every host."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "val_worker.py"
    worker.write_text(VAL_WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo

    port = "12519"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port,
             str(tmp_path / f"exp{i}")],
            env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    scores = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        scores += [float(l.split("SCORE:")[1]) for l in out.splitlines()
                   if "SCORE:" in l]
    assert len(scores) == 2
    assert scores[0] == scores[1], scores


def _rehearsal_corpus(tmp_path, rng):
    """Tiny dynamic-mixing corpus + DNS-layout validation split."""
    from fullsubnet_plus_tpu.data.wav import write_wav

    sr = 16000
    t = np.arange(sr) / sr
    clean_dir = tmp_path / "clean"
    noise_dir = tmp_path / "noise"
    clean_dir.mkdir()
    noise_dir.mkdir()
    for i in range(16):
        write_wav(str(clean_dir / f"c{i:02d}.wav"),
                  0.3 * np.sin(2 * np.pi * (180 + 25 * i) * t), sr)
    for i in range(2):
        write_wav(str(noise_dir / f"n{i}.wav"),
                  (0.1 * rng.standard_normal(sr)).astype(np.float32), sr)
    (tmp_path / "clean.txt").write_text(
        "\n".join(str(clean_dir / f"c{i:02d}.wav") for i in range(16)) + "\n")
    (tmp_path / "noise.txt").write_text(
        "\n".join(str(noise_dir / f"n{i}.wav") for i in range(2)) + "\n")
    val = tmp_path / "no_reverb"
    (val / "noisy").mkdir(parents=True)
    (val / "clean").mkdir()
    for i in range(2):
        clean = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        write_wav(str(val / "clean" / f"clean_fileid_{i}.wav"), clean, sr)
        write_wav(str(val / "noisy" / f"x_snr5_fileid_{i}.wav"),
                  clean + 0.05 * rng.standard_normal(sr).astype(np.float32), sr)
    return val


def _rehearsal_config(tmp_path, save_dir, val_dir, epochs):
    return f"""
[meta]
save_dir = "{save_dir}"
seed = 0
[acoustics]
n_fft = 64
win_length = 64
sr = 16000
hop_length = 32
[loss_function]
name = "mse_loss"
[optimizer]
lr = 0.001
[train_dataset]
path = "fullsubnet_plus.dataset.dataset_train.Dataset"
[train_dataset.args]
clean_dataset = "{tmp_path}/clean.txt"
noise_dataset = "{tmp_path}/noise.txt"
rir_dataset = ""
snr_range = [0, 10]
reverb_proportion = 0.0
sub_sample_length = 0.5
sr = 16000
[train_dataset.dataloader]
batch_size = 4
num_workers = 1
drop_last = true
[validation_dataset]
path = "fullsubnet_plus.dataset.dataset_validation.Dataset"
[validation_dataset.args]
dataset_dir_list = ["{val_dir}"]
sr = 16000
[model]
path = "fullsubnet_plus.model.fullsubnet_plus.FullSubNet_Plus"
[model.args]
sb_num_neighbors = 4
fb_num_neighbors = 0
num_freqs = 33
look_ahead = 2
sequence_model = "LSTM"
fb_output_activate_function = "ReLU"
sb_output_activate_function = false
channel_attention_model = "TSSE"
fb_model_hidden_size = 16
sb_model_hidden_size = 16
weight_init = false
norm_type = "offline_laplace_norm"
num_groups_in_drop_band = 2
kersize = [3, 5, 10]
subband_num = 1
[trainer]
path = "fullsubnet_plus.trainer.trainer.Trainer_Finetune"
[trainer.train]
epochs = {epochs}
save_checkpoint_interval = 1
clip_grad_norm_value = 10
[trainer.validation]
validation_interval = 3
[trainer.visualization]
metrics = ["SI_SDR"]
num_workers = 1
"""


def _launch_pair(repo, env, configs, port, extra=()):
    return [
        subprocess.Popen(
            [sys.executable, "-m", "fullsubnet_plus_tpu.cli.train",
             "-C", str(configs[i]), "--coordinator", f"127.0.0.1:{port}",
             "--num-hosts", "2", "--host-id", str(i), *extra],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]


def _epoch_losses(log_path):
    import re

    losses = {}
    for line in open(log_path):
        m = re.search(r"\[Train\] epoch (\d+) loss ([0-9.eE+-]+) ", line)
        if m:
            losses[int(m.group(1))] = float(m.group(2))  # last occurrence wins
    return losses


@pytest.mark.slow
def test_cli_train_two_process_kill_and_resume(tmp_path, rng):
    """End-to-end multi-host trainer rehearsal (VERDICT r2 next-round #1):
    `cli.train` ITSELF runs across 2 processes — per-host dynamic-mixing
    data sharding, cross-process gradient all-reduce, primary-only bucketed
    validation with score broadcast, primary-only checkpoints. One process
    is then SIGKILLed mid-run and both are restarted with -R: the union of
    the interrupted run's epoch losses and the resumed run's must exactly
    reproduce an uninterrupted 2-process run (deterministic
    per-(host,epoch,index) data RNG), and the non-primary host must have
    written no artifacts. Mirrors the reference's whole-trainer
    multi-process launch (tools/train.py:117-120 ->
    base_trainer.py:304-341) plus the kill/resume it cannot do."""
    import shutil
    import signal
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    val_dir = _rehearsal_corpus(tmp_path, rng)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    epochs = 6

    def write_configs(tag):
        paths = []
        for i in range(2):
            save = tmp_path / f"{tag}_exp{i}"
            cfg = tmp_path / f"{tag}_cfg{i}.toml"
            cfg.write_text(_rehearsal_config(tmp_path, save, val_dir, epochs))
            paths.append(cfg)
        return paths

    # -- A: uninterrupted 2-process run (the gold trajectory) ---------------
    cfgs_a = write_configs("a")
    procs = _launch_pair(repo, env, cfgs_a, "12613")
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), f"A failed:\n{outs[0][-3000:]}\n{outs[1][-3000:]}"
    a_exp = tmp_path / "a_exp0"
    assert (a_exp / "run_complete.json").exists()
    assert (a_exp / "checkpoints" / f"model_{epochs:04d}.npz").exists()
    gold = _epoch_losses(a_exp / "train.log")
    assert sorted(gold) == list(range(1, epochs + 1)), gold
    a_log = open(a_exp / "train.log").read()
    assert "[Val]" in a_log, "validation never ran on the primary"
    # primary-only artifacts: the non-primary save_dir was never created
    assert not (tmp_path / "a_exp1").exists()

    # -- B1: same run, SIGKILL the non-primary mid-training -----------------
    cfgs_b = write_configs("b")
    b_exp = tmp_path / "b_exp0"
    procs = _launch_pair(repo, env, cfgs_b, "12614")
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            losses = (_epoch_losses(b_exp / "train.log")
                      if (b_exp / "train.log").exists() else {})
            if len(losses) >= 2 or procs[0].poll() is not None:
                break
            time.sleep(0.25)
        assert procs[0].poll() is None, (
            "run B finished before the kill could land — slow the config down"
        )
        os.kill(procs[1].pid, signal.SIGKILL)
        # The survivor is mid-collective with a dead peer. Give it a window
        # to fail fast (dead-backend checkpoint-and-exit), then escalate:
        # SIGTERM (preemption checkpoint) -> SIGKILL — exactly what a
        # cluster manager does to a stuck survivor. All three end states
        # leave a resumable checkpoint.
        try:
            procs[0].wait(timeout=60)
        except subprocess.TimeoutExpired:
            procs[0].terminate()
            try:
                procs[0].wait(timeout=45)
            except subprocess.TimeoutExpired:
                procs[0].kill()
                procs[0].wait()
        procs[1].wait()
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    interrupted = _epoch_losses(b_exp / "train.log")
    assert 0 < len(interrupted) < epochs, interrupted
    assert (b_exp / "checkpoints" / "latest_model.npz").exists()
    assert not (b_exp / "run_complete.json").exists()

    # -- B2: restart BOTH with -R (shared-fs semantics: the non-primary
    # reads the same latest checkpoint; here that means copying it into its
    # own save_dir, which must stay otherwise empty) ------------------------
    shadow = tmp_path / "b_exp1"
    assert not shadow.exists(), "non-primary wrote artifacts before the kill"
    (shadow / "checkpoints").mkdir(parents=True)
    shutil.copy(b_exp / "checkpoints" / "latest_model.npz",
                shadow / "checkpoints" / "latest_model.npz")
    procs = _launch_pair(repo, env, cfgs_b, "12615", extra=("-R",))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), f"B2 failed:\n{outs[0][-3000:]}\n{outs[1][-3000:]}"
    assert (b_exp / "run_complete.json").exists()
    assert (b_exp / "checkpoints" / f"model_{epochs:04d}.npz").exists()

    # the resumed trajectory must reproduce the uninterrupted run exactly
    resumed = _epoch_losses(b_exp / "train.log")
    assert sorted(resumed) == list(range(1, epochs + 1)), resumed
    for epoch, loss in gold.items():
        np.testing.assert_allclose(
            resumed[epoch], loss, rtol=1e-6,
            err_msg=f"epoch {epoch} diverged after kill+resume",
        )

    # non-primary still wrote nothing of its own
    leftover = [
        os.path.relpath(os.path.join(d, f), shadow)
        for d, _, files in os.walk(shadow) for f in files
    ]
    assert leftover == [os.path.join("checkpoints", "latest_model.npz")], leftover


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path, rng):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo

    port = "12517"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    losses = [
        float(line.split("LOSS:")[1])
        for out in outs
        for line in out.splitlines()
        if "LOSS:" in line
    ]
    assert len(losses) == 2
    assert losses[0] == losses[1], losses

    # single-process reference on the same global batch
    import jax
    import jax.numpy as jnp
    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
    from fullsubnet_plus_tpu.train.loss import mse_loss
    from fullsubnet_plus_tpu.train.step import (
        make_optimizer, make_train_step, init_train_state,
    )

    cfg = FullSubNetPlusConfig(
        num_freqs=33, sb_num_neighbors=4, fb_model_hidden_size=32,
        sb_model_hidden_size=24,
    )
    optimizer = make_optimizer()
    state = init_train_state(FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), cfg), optimizer)
    step = make_train_step(
        FULLSUBNET_PLUS, cfg, optimizer, mse_loss,
        n_fft=64, hop_length=32, win_length=64,
    )
    g = np.random.default_rng(0)
    noisy = (g.standard_normal((4, 2048)) * 0.1).astype(np.float32)
    clean = (0.8 * noisy).astype(np.float32)
    _, metrics = step(state, noisy, clean)
    np.testing.assert_allclose(losses[0], float(metrics["loss"]), rtol=1e-5)
