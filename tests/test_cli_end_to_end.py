"""End-to-end CLI integration: prepare-data -> train -> enhance -> metrics
on a tiny synthetic corpus with a shrunken model (CPU-friendly).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fullsubnet_plus_tpu.data.wav import write_wav, read_wav

SR = 16000


@pytest.fixture
def workspace(tmp_path, rng):
    """Corpus + config files for a tiny end-to-end run."""
    clean_dir = tmp_path / "clean"
    noise_dir = tmp_path / "noise"
    noisy_dir = tmp_path / "noisy_in"
    for d in (clean_dir, noise_dir, noisy_dir):
        d.mkdir()
    t = np.arange(SR) / SR
    for i in range(4):
        write_wav(
            str(clean_dir / f"c{i}.wav"),
            0.3 * np.sin(2 * np.pi * (220 + 60 * i) * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t)),
            SR,
        )
        write_wav(
            str(noisy_dir / f"n{i}.wav"),
            (0.2 * rng.standard_normal(SR)).astype(np.float32),
            SR,
        )
    for i in range(2):
        write_wav(str(noise_dir / f"noise{i}.wav"), 0.1 * rng.standard_normal(SR), SR)

    (tmp_path / "clean.txt").write_text(
        "\n".join(str(clean_dir / f"c{i}.wav") for i in range(4)) + "\n"
    )
    (tmp_path / "noise.txt").write_text(
        "\n".join(str(noise_dir / f"noise{i}.wav") for i in range(2)) + "\n"
    )

    # validation split in DNS layout
    val = tmp_path / "no_reverb"
    (val / "noisy").mkdir(parents=True)
    (val / "clean").mkdir()
    for i in range(2):
        clean = 0.3 * np.sin(2 * np.pi * 300 * t).astype(np.float32)
        write_wav(str(val / "clean" / f"clean_fileid_{i}.wav"), clean, SR)
        write_wav(
            str(val / "noisy" / f"x_snr5_fileid_{i}.wav"),
            clean + 0.05 * rng.standard_normal(SR).astype(np.float32),
            SR,
        )

    model_args = """
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
fb_model_hidden_size = 32
sb_model_hidden_size = 24
weight_init = false
norm_type = "offline_laplace_norm"
num_groups_in_drop_band = 2
kersize = [3, 5, 10]
subband_num = 1
"""
    train_toml = f"""
[meta]
save_dir = "{tmp_path}/exp"
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
num_workers = 2
drop_last = true

[validation_dataset]
path = "fullsubnet_plus.dataset.dataset_validation.Dataset"
[validation_dataset.args]
dataset_dir_list = ["{val}"]
sr = 16000

{model_args}

[trainer]
path = "fullsubnet_plus.trainer.trainer.Trainer_Finetune"
[trainer.train]
epochs = 2
save_checkpoint_interval = 1
clip_grad_norm_value = 10
[trainer.validation]
validation_interval = 1
save_max_metric_score = true
[trainer.visualization]
metrics = ["STOI", "SI_SDR"]
num_workers = 2
"""
    infer_toml = f"""
[acoustics]
n_fft = 64
win_length = 64
sr = 16000
hop_length = 32

[inferencer]
type = "mag_complex_full_band_crm_mask"
[inferencer.args]
n_neighbor = 4

[dataset]
path = "fullsubnet.dataset.dataset_inference.Dataset"
[dataset.args]
dataset_dir_list = ["{noisy_dir}"]
sr = 16000

{model_args}
"""
    (tmp_path / "train.toml").write_text(train_toml)
    (tmp_path / "inference.toml").write_text(infer_toml)
    return tmp_path


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [sys.executable, "-m"] + args,
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert result.returncode == 0, f"{args}\nSTDOUT:{result.stdout}\nSTDERR:{result.stderr}"
    return result


@pytest.mark.slow
def test_end_to_end(workspace):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # 1. train 2 epochs (with validation + checkpoints)
    _run(
        ["fullsubnet_plus_tpu.cli.train", "-C", str(workspace / "train.toml")],
        cwd=repo,
    )
    ckpt_dir = workspace / "exp" / "checkpoints"
    assert (ckpt_dir / "latest_model.npz").exists()
    assert (ckpt_dir / "model_0002.npz").exists()
    assert (ckpt_dir / "best_model.npz").exists()
    assert (workspace / "exp" / "config.toml").exists()

    # 2. resume one more epoch
    _run(
        ["fullsubnet_plus_tpu.cli.train", "-C", str(workspace / "train.toml"),
         "-R", "--epochs", "3"],
        cwd=repo,
    )
    assert (ckpt_dir / "model_0003.npz").exists()

    # 3. enhance the noisy dir with the trained checkpoint
    out_dir = workspace / "enhanced"
    _run(
        ["fullsubnet_plus_tpu.cli.enhance",
         "-C", str(workspace / "inference.toml"),
         "-M", str(ckpt_dir / "best_model.npz"),
         "-O", str(out_dir), "--batch", "2"],
        cwd=repo,
    )
    wavs = sorted(os.listdir(out_dir))
    assert len(wavs) == 4
    y = read_wav(str(out_dir / wavs[0]))
    assert y.shape == (SR,)
    assert np.isfinite(y).all()
    assert 0.7 < np.max(np.abs(y)) <= 0.81  # 0.8-peak rescale applied

    # 4. metrics CLI over enhanced vs clean validation pair layout
    result = _run(
        ["fullsubnet_plus_tpu.cli.calculate_metrics",
         "-R", str(workspace / "no_reverb" / "clean"),
         "-E", str(workspace / "no_reverb" / "noisy"),
         "-M", "SI_SDR,STOI", "-S", "DNS_1"],
        cwd=repo,
    )
    assert "SI_SDR" in result.stdout and "STOI" in result.stdout


@pytest.mark.slow
def test_cli_from_torch_resume(workspace):
    """--from-torch through the real CLI: a reference-format .tar (weights
    + Adam state + epoch) seeds the run, training continues from the
    recorded epoch, and a subsequent -R resume takes precedence over
    --from-torch (the supervisor's relaunch path)."""
    import torch

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # Build a tiny reference-format checkpoint at the workspace's model
    # config: random-init weights via our export path (loads strict=True),
    # with a fresh (empty-state) optimizer and epoch=3.
    import jax

    from fullsubnet_plus_tpu.io.checkpoint import save_torch_checkpoint
    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig

    cfg = FullSubNetPlusConfig(
        num_freqs=33, sb_num_neighbors=4, fb_model_hidden_size=32,
        sb_model_hidden_size=24,
    )
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(9), cfg)
    tar = workspace / "reference_latest.tar"
    save_torch_checkpoint(str(tar), params, "fullsubnet_plus", epoch=3)

    _run(
        ["fullsubnet_plus_tpu.cli.train", "-C", str(workspace / "train.toml"),
         "--from-torch", str(tar), "--epochs", "5"],
        cwd=repo,
    )
    ckpt_dir = workspace / "exp" / "checkpoints"
    # epoch=3 in the .tar -> training ran epochs 4 and 5 only
    assert (ckpt_dir / "model_0004.npz").exists()
    assert (ckpt_dir / "model_0005.npz").exists()
    assert not (ckpt_dir / "model_0001.npz").exists()
    log = (workspace / "exp" / "train.log").read_text()
    assert "Resumed from torch checkpoint" in log

    # -R wins over --from-torch: the run continues from epoch 5, it does
    # not restart at the torch checkpoint's epoch 3.
    _run(
        ["fullsubnet_plus_tpu.cli.train", "-C", str(workspace / "train.toml"),
         "--from-torch", str(tar), "-R", "--epochs", "6"],
        cwd=repo,
    )
    assert (ckpt_dir / "model_0006.npz").exists()
    log = (workspace / "exp" / "train.log").read_text()
    assert "--from-torch" in log and "takes precedence" in log
