"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so that sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benchmarks run on the real chip).

IMPORTANT import-order note: in this image, importing torch *before* jax
deadlocks jax platform initialisation, so jax is imported first here and any
test needing torch must import it after this module loaded.
"""
import os
import sys

# Must happen before the first jax.devices() call anywhere in the process.
# The image's sitecustomize pins JAX_PLATFORMS=axon, so the env var alone is
# not enough — override through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (import before torch, see note above)

jax.config.update("jax_platforms", "cpu")

# Force backend initialisation NOW: torch imported while jax's backend is
# still uninitialised deadlocks the axon plugin handshake.
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# vendored demo fixtures (copied from the reference's bundled test data so
# the suite is self-contained — no reference checkout needed; only
# test_torch_block_parity.py, which parity-tests against the reference's own
# torch source, still wants /root/reference and skips itself otherwise)
DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _ref(*parts):
    return os.path.join(DATA_DIR, *parts)


@pytest.fixture(scope="session")
def eventalign_fpath():
    return _ref("eventalign.txt")


@pytest.fixture(scope="session")
def golden_eventalign_index():
    return _ref("eventalign.index")


@pytest.fixture(scope="session")
def golden_data_info():
    return _ref("data.info")


@pytest.fixture(scope="session")
def golden_data_json():
    return _ref("data.json")


@pytest.fixture(scope="session")
def golden_data_info_labelled():
    return _ref("data.info.labelled")


@pytest.fixture(scope="session")
def golden_indiv_proba():
    return _ref("data.indiv_proba.csv.gz")


@pytest.fixture(scope="session")
def golden_site_proba():
    return _ref("data.site_proba.csv.gz")


@pytest.fixture(scope="session")
def demo_dataprep_dir(tmp_path_factory, eventalign_fpath):
    """Run our dataprep once per session on the demo eventalign.txt."""
    out_dir = tmp_path_factory.mktemp("dataprep_out")
    from m6anet_tpu.dataprep import runner

    runner.run_dataprep(
        eventalign_fpath,
        str(out_dir),
        n_processes=2,
        readcount_min=1,
        readcount_max=1000,
        min_segment_count=1,
        n_neighbors=1,
        compress=False,
    )
    return str(out_dir)


@pytest.fixture(scope="session")
def production_model():
    import tomllib

    from m6anet_tpu.constants import DEFAULT_MODEL_CONFIG, DEFAULT_MODEL_WEIGHTS
    from m6anet_tpu.models import load_model

    with open(DEFAULT_MODEL_CONFIG, "rb") as f:
        cfg = tomllib.load(f)
    return load_model(cfg, DEFAULT_MODEL_WEIGHTS)
