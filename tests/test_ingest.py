"""The ingest tool reproduces the committed data store from the raw
public files (skipped when the raw checkout is not mounted)."""

import os

import numpy as np
import pytest

RAW = os.environ.get("COSMAX_RAW_SOURCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(RAW, "y2025BAO")),
    reason="raw data checkout not mounted",
)


@pytest.fixture(scope="module")
def fresh_store(tmp_path_factory, monkeypatch_module=None):
    """Run the full ingest into a temporary store directory."""
    from cosmax.data import ingest

    tmp = str(tmp_path_factory.mktemp("store"))
    orig = ingest.STORE
    ingest.STORE = tmp
    try:
        ingest.main(["--source", RAW])
    finally:
        ingest.STORE = orig
    return tmp


def _load(store, name):
    with np.load(os.path.join(store, f"{name}.npz"), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.parametrize(
    "name",
    [
        "desi_dr2", "sdss_dr16", "sdss_dr16_comp", "pantheon_plus",
        "des5y", "union3", "union21", "pantheon18", "pantheon18_bins",
        "cc", "quasars", "fs8",
    ],
)
def test_ingest_reproduces_committed_store(fresh_store, name):
    from cosmax.data.loaders import store_path

    fresh = _load(fresh_store, name)
    committed = _load(store_path(), name)
    assert set(fresh) == set(committed), name
    for key in fresh:
        np.testing.assert_array_equal(fresh[key], committed[key], err_msg=f"{name}/{key}")


def test_ingest_known_shapes(fresh_store):
    b = _load(fresh_store, "pantheon_plus")
    assert b["z_hd"].shape == (1701,)
    assert _load(fresh_store, "des5y")["mu"].shape == (1829,)
    assert int(_load(fresh_store, "des5y")["effective_sample_size"]) == 1735
    assert _load(fresh_store, "union3")["mu"].shape == (22,)
    assert _load(fresh_store, "desi_dr2")["z"].shape == (13,)
    assert _load(fresh_store, "cc")["H"].shape == (33,)
