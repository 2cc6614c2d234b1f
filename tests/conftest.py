"""Test env: force CPU with 8 virtual devices (SURVEY.md §5.5).

The environment's axon sitecustomize registers a remote-TPU backend and
pins ``jax_platforms="axon,cpu"`` regardless of JAX_PLATFORMS, so the env
var alone is not enough — the config must be updated after import (before
any backend initialization).  Tests run on the 8-device virtual CPU mesh:
deterministic, local, and exercises multi-device sharding.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_boxes(rng, n, im_w=640.0, im_h=480.0, min_size=1.0):
    """Random well-formed (x1,y1,x2,y2) boxes inside an image."""
    x1 = rng.uniform(0, im_w - min_size - 1, size=n)
    y1 = rng.uniform(0, im_h - min_size - 1, size=n)
    w = rng.uniform(min_size, im_w / 2, size=n)
    h = rng.uniform(min_size, im_h / 2, size=n)
    x2 = np.minimum(x1 + w, im_w - 1)
    y2 = np.minimum(y1 + h, im_h - 1)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
