"""End-to-end tests of the `python -m cosmax.fit` CLI surface."""

import json
import os

import numpy as np
import pytest

from cosmax.fit import main


def test_list_prints_all_presets(capsys):
    from cosmax.configs import list_presets

    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    for name in list_presets():
        assert name in out


def test_fit_writes_outputs(tmp_path, capsys):
    out = tmp_path / "run"
    rc = main([
        "--preset", "bao.desi", "--model", "lcdm", "--steps", "60",
        "--walkers", "16", "--burn-in", "20", "--seed", "0",
        "--no-plots", "--out", str(out),
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "DESI BAO DR2" in text and "Chi squared" in text
    with open(out / "summary.json") as f:
        summ = json.load(f)
    assert set(summ["params"]) == {"h", "Om"}
    chain = np.load(out / "chain.npy")
    assert chain.shape == (40, 16, 2)  # (steps - burn_in, walkers, dim)
    assert np.isfinite(chain).all()


def test_fit_hmc_sampler(tmp_path, capsys):
    out = tmp_path / "hmc"
    rc = main([
        "--preset", "bao.desi", "--model", "lcdm", "--sampler", "hmc",
        "--steps", "80", "--walkers", "16", "--burn-in", "40",
        "--seed", "0", "--no-plots", "--out", str(out),
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "hmc:" in text and "step size" in text
    with open(out / "summary.json") as f:
        summ = json.load(f)
    assert summ["sampler"]["kind"] == "hmc"
    assert summ["sampler"]["divergent_trajectories"] == 0
    assert summ["sampler"]["divergences_per_chain"] == [0] * 16
    assert summ["sampler"]["warmup_retries"] == 0
    assert len(summ["sampler"]["split_gelman_rubin"]) == 2
    assert len(summ["sampler"]["inv_mass"]) == 2  # dense [2, 2] rows
    chain = np.load(out / "chain.npy")
    # warmup is separate and discarded: steps - burn_in recorded draws
    assert chain.shape == (40, 16, 2)
    assert np.isfinite(chain).all()


def test_fit_hmc_checkpoint_resume(tmp_path, capsys):
    """--checkpoint now works with --sampler hmc: a second invocation
    picks up where the first stopped (warmup done once, fixed
    parameters restored from the file)."""
    ck = str(tmp_path / "hmc_state.npz")
    base = ["--preset", "bao.desi", "--model", "lcdm", "--sampler", "hmc",
            "--walkers", "16", "--burn-in", "0", "--warmup", "40",
            "--seed", "0", "--no-plots", "--checkpoint", ck,
            "--checkpoint-every", "10"]
    rc = main(base + ["--steps", "15"])
    assert rc == 0
    capsys.readouterr()
    rc = main(base + ["--steps", "30"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "resumed from recorded draw 15" in text
    # third run: nothing left to do
    rc = main(base + ["--steps", "30"])
    assert rc == 0
    assert "already covers" in capsys.readouterr().out


def test_fit_checkpoint_resume(tmp_path, capsys):
    ck = str(tmp_path / "state.npz")
    args = ["--preset", "bao.desi", "--model", "lcdm", "--walkers", "16",
            "--burn-in", "0", "--seed", "3", "--no-plots",
            "--checkpoint", ck, "--checkpoint-every", "30"]
    assert main(args + ["--steps", "30"]) == 0
    capsys.readouterr()
    assert main(args + ["--steps", "60"]) == 0
    out = capsys.readouterr().out
    assert "resumed from step 30" in out
    # a third run with the same target is a no-op
    assert main(args + ["--steps", "60"]) == 0
    assert "nothing to do" in capsys.readouterr().out


def test_fit_rejects_bad_budgets(capsys):
    for bad in (["--steps", "0"], ["--walkers", "2"], ["--thin", "0"]):
        with pytest.raises(SystemExit):
            main(["--preset", "bao.desi", "--no-plots"] + bad)
        capsys.readouterr()


def test_gp_cli_writes_outputs(tmp_path, capsys):
    from cosmax.gp.__main__ import main as gp_main

    out = tmp_path / "gp"
    assert gp_main(["--out", str(out), "--iters", "300", "--grid", "40"]) == 0
    for name in ("cc_gp_Hz.png", "cc_gp_qz.png", "cc_gp_cov.png",
                 "gp_summary.json"):
        assert (out / name).stat().st_size > 0, name
