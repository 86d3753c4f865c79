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
