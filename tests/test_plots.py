"""Smoke tests for report.plots (figures render and contain data)."""

import numpy as np

from cosmax.report import plots


def test_corner_renders(tmp_path):
    rng = np.random.default_rng(0)
    flat = rng.multivariate_normal([0, 1], [[1, 0.5], [0.5, 2]], size=4000)
    fig = plots.corner(flat, labels=["a", "b"], bins=40)
    out = tmp_path / "corner.png"
    fig.savefig(out)
    assert out.stat().st_size > 5000


def test_trace_renders(tmp_path):
    rng = np.random.default_rng(1)
    samples = rng.normal(size=(100, 8, 3))
    fig = plots.trace(samples, labels=["x", "y", "z"])
    fig.savefig(tmp_path / "trace.png")


def test_prediction_panels(tmp_path):
    rng = np.random.default_rng(2)
    z = np.sort(rng.uniform(0.01, 1.5, 50))
    mag = 25 + 5 * np.log10(z * 4e3)
    fig = plots.predictions_sn(z, mag + rng.normal(0, 0.1, 50), 0.1 * np.ones(50),
                               z, mag, title="sn")
    fig.savefig(tmp_path / "sn.png")

    from cosmax.data.loaders import QTY_DV, QTY_DM, QTY_DH

    zb = np.array([0.3, 0.5, 0.5, 0.8])
    vals = np.array([8.0, 13.5, 21.9, 17.4])
    qty = np.array([QTY_DV, QTY_DM, QTY_DH, QTY_DM])
    fig = plots.predictions_bao(
        zb, vals, 0.2 * np.ones(4), qty,
        lambda zg, q: np.full_like(zg, {QTY_DV: 8.0, QTY_DM: 15.0, QTY_DH: 22.0}[q]),
        title="bao",
    )
    fig.savefig(tmp_path / "bao.png")

    zc = np.linspace(0.1, 1.9, 30)
    fig = plots.predictions_cc(zc, 70 * np.sqrt(0.3 * (1 + zc) ** 3 + 0.7),
                               5 * np.ones(30), zc,
                               70 * np.sqrt(0.3 * (1 + zc) ** 3 + 0.7), title="cc")
    fig.savefig(tmp_path / "cc.png")


def test_residual_histogram(tmp_path):
    resid = np.random.default_rng(3).normal(0, 0.15, 500)
    fig = plots.residual_histogram(resid, title="residuals")
    fig.savefig(tmp_path / "hist.png")


def test_field_cli_writes_five_figures(tmp_path):
    """python -m cosmax.field produces the reference field.py figures
    (field.py:41-104): phi(a), V(phi), V(a), kinetic term, phi(t)."""
    from cosmax.field import main

    assert main(["--out", str(tmp_path)]) == 0
    for name in ("field_phi_a.png", "field_v_phi.png", "field_v_a.png",
                 "field_kinetic_t.png", "field_phi_t.png"):
        assert (tmp_path / name).stat().st_size > 0, name


def test_field_cli_reads_summary(tmp_path):
    import json

    from cosmax.field import main

    summ = dict(params={"Om": {"median": 0.31}, "w0": {"median": -0.85}})
    (tmp_path / "summary.json").write_text(json.dumps(summ))
    assert main(["--summary", str(tmp_path), "--out", str(tmp_path / "figs")]) == 0
    assert (tmp_path / "figs" / "field_phi_a.png").stat().st_size > 0


def test_field_cli_rejects_phantom_w0(tmp_path):
    from cosmax.field import main

    import pytest

    with pytest.raises(SystemExit, match="phantom"):
        main(["--w0", "-1.2", "--out", str(tmp_path)])


def test_hubble_diagram_html(tmp_path):
    """Interactive HTML Hubble diagram (sn/plotting.py:8-41 analogue):
    standalone file, one error bar per datum in a toggleable layer,
    checkbox wired to it."""
    import numpy as np

    from cosmax.report.html import hubble_diagram_html

    rng = np.random.default_rng(0)
    z = np.sort(rng.uniform(0.01, 1.5, 40))
    mu = 5 * np.log10(z * 4283.0) + 25
    err = rng.uniform(0.05, 0.3, 40)
    path = tmp_path / "hd.html"
    out = hubble_diagram_html(z, mu, err, z, mu, str(path))
    text = path.read_text()
    assert out == str(path)
    assert text.startswith("<!DOCTYPE html>")
    assert 'id="errorbar-layer"' in text
    assert text.count("<line") >= 40  # error bars + ticks
    assert 'type="checkbox"' in text and "Error Bars" in text
    assert "<circle" in text and "<polyline" in text
    assert "http" not in text.split("xmlns")[0]  # no external assets
