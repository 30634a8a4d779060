import os
import pathlib

# Device tests run on a virtual 8-device CPU mesh; set before JAX import.
# Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the
# override must go through JAX_PLATFORM_NAME (which the plugin honors).
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

import pytest

DATA_DIR = pathlib.Path(__file__).parent / "data"
GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def data_dir():
    return DATA_DIR


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


@pytest.fixture(scope="session")
def test_index(tmp_path_factory):
    """Build the index for tests/data/ref.fa once per session."""
    from chromap_tpu.config import IndexConfig
    from chromap_tpu.pipeline import construct_index

    path = tmp_path_factory.mktemp("index") / "index"
    cfg = IndexConfig(reference_file_path=str(DATA_DIR / "ref.fa"),
                      index_output_file_path=str(path))
    construct_index(cfg)
    return str(path)
