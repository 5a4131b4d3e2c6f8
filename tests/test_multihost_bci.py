"""Multi-process BCI leg: debug Llama + LoRA + int8 frozen base across a
REAL 2-OS-process ``jax.distributed`` cluster (VERDICT r3 weak #5 / next #5).

``test_multihost.py`` proves the NDT1-mlm leg; the BCI leg crosses
``_put_host_tree`` and the distributed Orbax paths differently — the param
pytree mixes int8 codes + f32 scales (quantized frozen base) with bf16/f32
trainable leaves (LoRA adapters, projector, NDT1 trunk), and the
``quantize: int8 -> int8_xla`` mesh rewrite must engage so the dequant
matmul stays SPMD-partitionable. This trains 3 steps with params
FSDP-sharded ACROSS the two processes, saves the distributed train state,
and resumes it in a FRESH 2-process cluster.
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("transformers")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_multihost import _free_port

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
from llm_bci_tpu.config import DictConfig
from llm_bci_tpu.training import Trainer

dataset = pickle.load(open(os.path.join(tmp, "data.pkl"), "rb"))
pad = lambda v=0: {"dim": 0, "side": "right", "value": v, "truncate": None,
                   "min_length": None}
cfg = DictConfig(
    {
        "savestring": "mh_bci",
        "verbosity": 3,
        "seed": 1,
        "dirs": {"checkpoint_dir": os.path.join(tmp, "ckpt"), "log_dir": None},
        "training": {
            "num_epochs": 1, "train_batch_size": 8, "test_batch_size": 8,
            "max_steps": 3, "save_every": 3,
        },
        "model": {
            "model_class": "BCI",
            "ndt1": {"encoder": {
                "masker": {"neuron": {"active": False}},
                "smooth_and_noise": {"smooth_sd": 1, "white_noise_sd": 0.1,
                                     "constant_offset_sd": None},
                "embedder": {"n_channels": 12, "max_F": 20, "input_dim": 8,
                             "stack": {"active": True, "size": 4, "stride": 2},
                             "dropout": 0.1},
                "transformer": {"n_layers": 1, "hidden_size": 16, "n_heads": 2,
                                "inter_size": 16, "dropout": 0.1},
            }},
            "projector": {"stacking": 2, "inter_size": 16, "bias": True,
                          "act": "relu"},
        },
        "data": {"dataset_class": "decoding"},
        "method": {
            "model_kwargs": {
                "method_name": "endtoend", "debug": True,
                # the three-way pytree mix this test exists for:
                # int8 frozen base + LoRA adapters + trainable trunk
                "quantize": "int8",
                "lora": {"r": 2, "alpha": 16, "dropout": 0.0,
                         "target_modules": ["q_proj", "v_proj"],
                         "modules_to_save": []},
            },
            "dataset_kwargs": {"targets_name": "labels"},
            "dataloader_kwargs": {"pad_dict": {
                "spikes": pad(), "spikes_mask": pad(), "spikes_timestamp": pad(),
                "input_ids": pad(0), "attention_mask": pad(0),
                "targets": pad(-100), "targets_mask": pad(0),
            }},
        },
        "optimizer": {"lr": 1e-3, "scheduler": "cosine", "warmup_pct": 0.3},
        # fsdp 2 spans the two processes: every fsdp-sharded leaf (incl. the
        # int8 codes and their scales) has non-addressable shards on each
        # controller, so host access must all-gather and puts must go
        # through the host-local shard path.
        "parallelism": {"data": -1, "fsdp": 2, "fsdp_min_size": 64},
    }
)

trainer = Trainer(cfg, dataset=dataset)
# the mesh rewrite must have engaged: a pallas_call custom-call cannot be
# SPMD-partitioned over the 2x2 mesh
assert trainer.model.quant == "int8_xla", trainer.model.quant
import jax.numpy as jnp
q_leaf = trainer.state.params["llm"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
assert q_leaf.dtype == jnp.int8, q_leaf.dtype

if phase == "train":
    trainer.train()  # 3 steps; saves the distributed train_state at step 3
    loss, _ = trainer.evaluate()
else:
    step = trainer.resume_from()
    assert step == 3, f"resumed step {step}"
    loss, _ = trainer.evaluate()
    # LoRA adapters actually trained and restored (not a fresh zero init):
    # reduce on-device to a replicated scalar (the leaf's fsdp shards span
    # both processes, so it is not fully addressable from either)
    import jax
    leaf = trainer.state.params["llm"]["layers_0"]["self_attn"]["q_proj"]["lora_A"]
    nz = float(jax.device_get(jax.jit(lambda p: jnp.any(p != 0).astype(jnp.float32))(leaf)))
    assert nz == 1.0
print(f"MHRESULT {phase} {pid} {loss:.6f}", flush=True)
"""


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


def _rows(rng, n, T=20, N=12, L=12, vocab=32000):
    out = []
    for i in range(n):
        ids = rng.integers(3, vocab, size=(L,)).astype(np.int64)
        labels = ids.copy()
        labels[:4] = -100  # prompt prefix carries no loss
        out.append(
            {
                "spikes": rng.poisson(1.0, size=(T, N)).astype(np.float32),
                "input_ids": ids,
                "attention_mask": np.ones_like(ids),
                "input_split": np.atleast_1d(2),
                "labels": labels,
            }
        )
    return out


@pytest.mark.slow
def test_two_process_bci_int8_lora_train_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(0)
    pickle.dump(
        {"train": _rows(rng, 24), "test": _rows(rng, 8)},
        open(tmp_path / "data.pkl", "wb"),
    )

    losses = _run_phase(str(tmp_path), _free_port(), "train")
    assert np.isfinite(losses).all()
    assert abs(losses[0] - losses[1]) < 1e-6  # psum-reduced, replicated

    resumed = _run_phase(str(tmp_path), _free_port(), "resume")
    assert np.isfinite(resumed).all()
    assert abs(resumed[0] - resumed[1]) < 1e-6
    # restored params reproduce the trained model's eval loss
    assert abs(resumed[0] - losses[0]) < 1e-4
