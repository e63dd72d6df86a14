"""Test environment: force CPU with 8 virtual devices so sharding/collective
tests run without TPU hardware (the TPU-world equivalent of a multi-node
fake backend)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize force-registers a TPU backend and overrides
# JAX_PLATFORMS; pin the tests to the 8-virtual-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import sys

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (e2e oracles, multi-process "
             "launches, long parity/equivalence sweeps); the default run "
             "is the fast tier (~9 min on a 1-core CI host, well under 5 "
             "on a dev box), the full suite `pytest --runslow` is the "
             "release gate — see README")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def torch_oracle():
    """Import torch + the reference implementation as a numerical oracle.

    The reference's model module imports torchvision/matplotlib/IPython/
    tensorboard at module scope but never uses them in the model classes, so
    absent optional deps are stubbed out.  Reference code is used strictly as
    a test oracle; nothing from it ships in the framework.
    """
    torch = pytest.importorskip("torch")
    from unittest.mock import MagicMock

    import importlib.util

    for mod in ("torchvision", "torchvision.models", "torchvision.transforms",
                "torchvision.utils", "matplotlib", "matplotlib.pyplot",
                "IPython", "IPython.display", "torch.utils.tensorboard"):
        root = mod.split(".")[0]
        # stub only what is genuinely absent; matplotlib/IPython may be real
        if root in ("matplotlib", "IPython"):
            try:
                if importlib.util.find_spec(root) is not None:
                    continue
            except ValueError:
                continue  # already imported (possibly mocked earlier)
        sys.modules.setdefault(mod, MagicMock())
    # repo root must stay ahead of the reference dir: both define
    # train_*.py / visualize_*.py, and `import train_KITTI` in CLI tests must
    # resolve to this repo.  The reference-only modules (models, datasets,
    # losses) have no repo-root counterparts.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root in sys.path:
        sys.path.remove(repo_root)
    sys.path.insert(0, repo_root)
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(1, REFERENCE_DIR)
    torch.manual_seed(0)
    return torch


def assert_close(a, b, atol=1e-4, rtol=1e-4, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=atol, rtol=rtol, err_msg=msg)
