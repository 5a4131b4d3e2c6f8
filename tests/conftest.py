"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is the TPU-native analog of multi-process distributed tests the
reference lacks (SURVEY.md §4): sharding/collective correctness is validated
on 8 virtual CPU devices, exactly as the driver's multichip dry-run does.

Note: this environment may preload a TPU PJRT plugin via a sitecustomize
(which imports jax at interpreter start, freezing env-var based config), so
we must switch platforms through ``jax.config`` — not env vars — before any
backend is initialized.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(autouse=True)
def _reset_op_mesh():
    """Trainer construction assigns the process-global op mesh for the
    batch-parallel Pallas wrappers (ops/spmd.py); reset it between tests so
    kernel tests after a trainer test run unwrapped."""
    yield
    from llm_bci_tpu.ops import spmd

    spmd.set_op_mesh(None)
