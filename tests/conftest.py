"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is the TPU-native analog of multi-process distributed tests the
reference lacks (SURVEY.md §4): sharding/collective correctness is validated
on `--xla_force_host_platform_device_count=8` CPU devices, exactly as the
driver's multichip dry-run does.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
