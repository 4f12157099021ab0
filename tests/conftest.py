"""Test harness: force an 8-virtual-device CPU platform so sharding tests
run without TPU hardware (SURVEY.md §4)."""

import os

# The container's sitecustomize pre-imports jax with the axon TPU backend
# (JAX_PLATFORMS=axon); plain env vars are too late here.  Force CPU via
# jax.config BEFORE any backend is touched, and fan out 8 virtual devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compilation cache: the fast suite's wall time is
# dominated by COMPILES of the full-pipeline replay at several configs,
# duplicated per xdist worker and per run.  The cache is keyed on the
# HLO hash, so code changes invalidate exactly the affected entries;
# warm reruns drop from ~25 min to minutes.  Host-fingerprinted dir +
# no embedded XLA AOT payloads — see core/compile_cache.py for why.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lego_loam_tpu.core.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    from lego_loam_tpu.core.config import vlp16
    return vlp16()


@pytest.fixture(scope="session")
def small_sequence(cfg):
    """A short synthetic sequence shared across tests."""
    from lego_loam_tpu.io.synthetic import make_sequence
    scans, gt, times = make_sequence(12, cfg, seed=3, noise=0.0)
    return scans, gt, times
