"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; the reference has no multi-node
story either.  Sharding tests therefore use XLA's host-platform device
virtualization (SURVEY.md section 4, "Implications for the TPU build").
Must be set before jax initializes.
"""

import os

# Force-override: the host environment exports JAX_PLATFORMS=axon (the TPU
# tunnel); tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
# Skip axon plugin registration in every subprocess tests spawn (examples,
# bench weatherproofing probes): the sitecustomize's register() runs at
# interpreter start and HANGS for minutes when the tunnel is saturated or
# dead — test_build_then_load_example_slice flaked with a 600 s subprocess
# timeout while a TPU session was mid-build on this box.  (The main pytest
# process already paid registration before this conftest ran; this guards
# the children, which is where the wall-clock goes.)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: the clustering subdivision compiles a bucketed
# family of shapes; caching makes reruns fast on the 1-core CI host.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (already imported by the axon sitecustomize)

# The axon sitecustomize imports jax at interpreter start, so JAX_PLATFORMS
# from the env was captured before this conftest ran — override via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def toy_data():
    """The canonical 6x2 three-pair dataset used throughout the reference's
    tests and examples (hierarchical.rs:400-402, examples/build_index.rs:9-12)."""
    return np.array(
        [
            [1.0, 2.0],
            [1.5, 2.5],
            [8.0, 8.0],
            [8.5, 8.5],
            [4.0, 4.0],
            [4.5, 4.5],
        ],
        dtype=np.float32,
    )
