"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware, per the pjit
shape-polymorphism strategy in SURVEY.md §4.

This environment force-registers a tunneled single-chip TPU backend ("axon") in
every interpreter via sitecustomize, overriding JAX_PLATFORMS. Tests must NOT
run there: the tunnel serializes processes (concurrent jax imports deadlock) and
the virtual multi-device CPU mesh would be unavailable. We both set the env
knobs (effective when pytest is launched with PALLAS_AXON_POOL_IPS='') and
force the platform through jax.config, which wins even after registration.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
