"""Test configuration: force an 8-device virtual CPU mesh.

Real multi-chip TPU hardware is not available in CI; all tests (including
sharding tests) run against XLA's CPU backend with 8 virtual devices, which
exercises the same mesh/shard_map/collective code paths the TPU pod path
uses.

Note: this environment's sitecustomize force-registers an "axon" TPU plugin
and overwrites jax_platforms at import time, so the JAX_PLATFORMS env var
alone is not enough — we must reset the config after importing jax, before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()


import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--design-points", action="store_true", default=False,
        help="also run parity suites for non-production backends "
             "(render/wavefront.py XLA walks, kernels/traversal.py Pallas "
             "packet BVH) — kept design points dispatch.auto never selects; "
             "sunset criteria in BASELINE.md")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "design_points: parity tests for kept-but-losing backends "
        "(opt-in via --design-points)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--design-points"):
        return
    skip = pytest.mark.skip(
        reason="design-point backend parity suite; run with --design-points")
    for item in items:
        if "design_points" in item.keywords:
            item.add_marker(skip)
