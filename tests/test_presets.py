"""Every preset x model builds and yields a finite log-probability at
the bounds midpoint (evaluated eagerly — op-level compiles are cached
across presets on this compile-bound CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cosmax.configs import PRESETS, get_preset, list_presets


@pytest.mark.parametrize("name", list_presets())
@pytest.mark.parametrize("model", ["lcdm", "wzcdm", "w0wacdm"])
def test_preset_builds_and_evaluates(name, model):
    fit = get_preset(name, model)
    lp = fit.log_prob()
    mid = 0.5 * (fit.spec.bounds[:, 0] + fit.spec.bounds[:, 1])
    val = float(lp(jnp.asarray(mid)))
    assert np.isfinite(val)
    assert fit.spec.dim == len(fit.spec.names)
    assert fit.data_size > 0
    # out-of-bounds must be -inf
    bad = mid.copy()
    bad[0] = fit.spec.bounds[0, 1] + 1.0
    assert float(lp(jnp.asarray(bad))) == -np.inf


def test_model_param_adjustment():
    lc = get_preset("bao.desi", "lcdm")
    wz = get_preset("bao.desi", "wzcdm")
    cpl = get_preset("bao.desi", "w0wacdm")
    assert "w0" not in lc.spec.names
    assert "w0" in wz.spec.names and "wa" not in wz.spec.names
    assert "wa" in cpl.spec.names


def test_unknown_preset_message():
    with pytest.raises(KeyError, match="available"):
        get_preset("bao.nope")


def test_registry_covers_reference_matrix():
    """One preset per reference analysis script (SURVEY.md SS2.3)."""
    expected = {
        "sn.pantheon", "sn.pantheon_shoes", "sn.union3", "sn.des5y",
        "sn.union21", "sn.pantheon18",
        "sn.pantheon_cmb", "sn.union3_cmb", "sn.des5y_cmb",
        "bao.desi", "bao.sdss", "bao.desi_omh2", "bao.desi_bbn",
        "bao.desi_bbn_theta_star", "bao.desi_omh2_theta_star",
        "bao.desi_cc", "bao.desi_pantheon", "bao.desi_union3",
        "bao.desi_des5y", "bao.desi_pantheon_cc", "bao.desi_union3_cc",
        "bao.desi_des5y_cc", "bao.desi_cmb", "bao.desi_cmb_pantheon",
        "bao.desi_cmb_union3", "bao.desi_cmb_des5y",
        "bao.desi_union3_bbn", "bao.desi_des5y_bbn",
        "bao.desi_union3_omh2", "bao.desi_des5y_omh2",
        "cc.cc", "cc.cc_plain", "cc.cc_cmb", "cc.cc_pantheon",
        "cc.cc_union3", "cc.cc_des5y",
        "qsr.pantheon", "qsr.union3", "qsr.des5y", "qsr.desi",
        "qsr.des5y_desi",
        "fs8.fs8", "cmb.cmb",
    }
    assert expected <= set(list_presets())


def test_index_matches_registry():
    """The static --list index (cosmax/_preset_index.py) must track the
    live registry exactly; regenerate with tools/gen_preset_index.py."""
    from cosmax._preset_index import PRESET_NOTES

    assert set(PRESET_NOTES) == set(list_presets())
    for name in list_presets():
        assert PRESET_NOTES[name] == get_preset(name, "wzcdm").note, name
