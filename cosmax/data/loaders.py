"""Typed dataset bundles loaded from the cosmax data store.

Each loader returns a frozen container of f64 numpy arrays plus the
covariance assembled exactly as the reference assembles it (stat +
systematic terms, cuts, sorting). Whitening operators (inverse Cholesky
factors) are computed lazily once per dataset and cached — likelihood
builders bake them into the jitted program as constants.

Datasets whose full systematic covariance is not available in the store
(see ``cosmax/data/ingest.py``) fall back to the diagonal statistical
covariance and set ``synthetic_cov=True``.
"""

import os
from contextlib import contextmanager
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np

from cosmax.ops.linalg import whitening_operator, log_det_cov

_STORE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "store")

# --- synthetic-systematics switch -----------------------------------------
# The four large SN systematic covariances are stripped from the mounted
# reference checkout (see cosmax/data/synthetic_cov.py). Default: fall
# back to the diagonal statistical covariance. Inside
# ``use_synthetic_sys()`` the loaders instead add a deterministic,
# realistically-structured synthetic systematic term so the dense
# full-covariance code paths run at the true problem scale. Either way
# the dataset is marked ``synthetic_cov=True`` — chi^2 against these is
# never comparable to the published full-covariance results.
_SYNTHETIC_SYS = False


def synthetic_sys_enabled() -> bool:
    return _SYNTHETIC_SYS


@contextmanager
def use_synthetic_sys(on: bool = True):
    global _SYNTHETIC_SYS
    prev = _SYNTHETIC_SYS
    _SYNTHETIC_SYS = on
    try:
        yield
    finally:
        _SYNTHETIC_SYS = prev


@lru_cache(maxsize=None)
def _synthetic_sys_for(name: str):
    """Synthetic systematic covariance on the dataset's FULL table (the
    reference applies selection cuts to the loaded full matrix, so the
    same generated matrix must serve every selection of the bundle)."""
    from cosmax.data.synthetic_cov import seed_for, synthetic_sys_cov

    b = _bundle(name)
    if name == "pantheon_plus":
        z, err = b["z_hd"], b["m_b_corr_err_diag"]
    elif name == "des5y":
        z, err = b["z_hd"], b["mu_err"]
    elif name == "union21":
        z, err = b["z"], b["sigma_mu"]
    elif name == "pantheon18":
        z, err = b["z_cmb"], b["dmb"]
    else:
        raise KeyError(name)
    return synthetic_sys_cov(z, err, seed=seed_for(name))

# BAO quantity codes shared with the ingest tool and the BAO likelihood
# (reference bao/desi.py:69-75).
QTY_DV, QTY_DM, QTY_DH = 0, 1, 2


def store_path() -> str:
    return _STORE


@lru_cache(maxsize=None)
def _bundle(name: str) -> dict:
    path = os.path.join(_STORE, f"{name}.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"dataset bundle {name!r} not found in {_STORE}; "
            "run `python -m cosmax.data.ingest --source <raw data checkout>`"
        )
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


@dataclass(frozen=True)
class CovDataset:
    """A Gaussian dataset: values with an N x N covariance."""

    legend: str
    values: np.ndarray
    cov: np.ndarray
    synthetic_cov: bool = False
    extras: dict = field(default_factory=dict, repr=False)

    @property
    def n(self) -> int:
        return self.values.size

    @property
    def linv(self) -> np.ndarray:
        cached = self.extras.get("_linv")
        if cached is None:
            cached = whitening_operator(self.cov)
            self.extras["_linv"] = cached
        return cached

    @property
    def log_det(self) -> float:
        cached = self.extras.get("_logdet")
        if cached is None:
            cached = log_det_cov(self.cov)
            self.extras["_logdet"] = cached
        return cached

    def __getattr__(self, name):
        extras = self.__dict__.get("extras")
        if extras is not None and name in extras:
            return extras[name]
        raise AttributeError(name)


def load_bao(name: str = "desi_dr2") -> CovDataset:
    """DESI DR2 (reference y2025BAO/data.py) or SDSS DR16
    (y2020SDSSBAO/data.py); ``name`` in {desi_dr2, sdss_dr16,
    sdss_dr16_comp}. Values are D_{V,M,H}/r_d with integer quantity
    codes {0, 1, 2}."""
    b = _bundle(name)
    return CovDataset(
        legend=str(b["legend"]),
        values=b["value"],
        cov=b["cov"],
        extras=dict(z=b["z"], quantity=b["quantity"]),
    )


def load_sn(name: str = "pantheon_plus", **kwargs) -> CovDataset:
    """Supernova compilations with reference-exact selections:

    * ``pantheon_plus``      — zHD > 0.01 cut, 1590 SNe
                               (y2022pantheonSHOES/data.py:20-29)
    * ``pantheon_plus_shoes``— calibrators kept, 1657 SNe + CEPH_DIST
                               (y2022pantheonSHOES/data_shoes.py:20-33)
    * ``des5y``              — 1829 SNe, cov = sys + diag(MUERR^2)
                               (y2024DES/data.py:18-31)
    * ``des5y_bins``         — inverse-variance 50-per-bin compression
                               (y2024DES/data_bins.py)
    * ``union3``             — 22 bins, full covariance
    * ``union21``            — 580 SNe
    * ``pantheon18``         — 1048 SNe, cov = sys + diag(dmb^2)
    * ``pantheon18_bins``    — 40 bins with systematic covariance
    """
    if name in ("pantheon_plus", "pantheon_plus_shoes"):
        b = _bundle("pantheon_plus")
        z = b["z_hd"]
        if name == "pantheon_plus":
            sel = np.where(z > 0.01)[0]
            legend = "Pantheon+ (2022)"
        else:
            sel = np.where((b["is_calibrator"] == 1) | (z > 0.01))[0]
            legend = "Pantheon+ and SH0ES"
        if "cov" in b:
            cov, synth = b["cov"][np.ix_(sel, sel)], False
        else:
            cov = np.diag(b["m_b_corr_err_diag"][sel] ** 2)
            if _SYNTHETIC_SYS:
                cov = cov + _synthetic_sys_for("pantheon_plus")[np.ix_(sel, sel)]
            synth = True
        extras = dict(z_cmb=z[sel], z_hel=b["z_hel"][sel])
        if name == "pantheon_plus_shoes":
            extras["ceph_dist"] = b["ceph_dist"][sel]
            extras["is_calibrator"] = b["is_calibrator"][sel]
        return CovDataset(legend, b["m_b_corr"][sel], cov, synth, extras)

    if name == "des5y":
        b = _bundle("des5y")
        if "cov_sys" in b:
            cov, synth = b["cov_sys"] + np.diag(b["mu_err"] ** 2), False
        else:
            cov = np.diag(b["mu_err"] ** 2)
            if _SYNTHETIC_SYS:
                cov = cov + _synthetic_sys_for("des5y")
            synth = True
        return CovDataset(
            str(b["legend"]),
            b["mu"],
            cov,
            synth,
            dict(
                z_cmb=b["z_hd"],
                z_hel=b["z_hel"],
                effective_sample_size=int(b["effective_sample_size"]),
            ),
        )

    if name == "des5y_bins":
        return _des5y_bins(bin_size=kwargs.get("bin_size", 50))

    if name == "union3":
        b = _bundle("union3")
        return CovDataset(
            str(b["legend"]),
            b["mu"],
            b["cov"],
            False,
            dict(z_cmb=b["z_cmb"], z_hel=b["z_hel"]),
        )

    if name == "union21":
        b = _bundle("union21")
        if "cov" in b:
            cov, synth = b["cov"], False
        else:
            cov = np.diag(b["sigma_mu"] ** 2)
            if _SYNTHETIC_SYS:
                cov = cov + _synthetic_sys_for("union21")
            synth = True
        return CovDataset(
            str(b["legend"]), b["mu"], cov, synth, dict(z_cmb=b["z"], z_hel=b["z"])
        )

    if name in ("pantheon18", "pantheon18_bins"):
        b = _bundle(name)
        if "cov_sys" in b:
            cov, synth = b["cov_sys"] + np.diag(b["dmb"] ** 2), False
        else:
            cov = np.diag(b["dmb"] ** 2)
            if _SYNTHETIC_SYS and name == "pantheon18":
                cov = cov + _synthetic_sys_for("pantheon18")
            synth = True
        return CovDataset(
            str(b["legend"]), b["mb"], cov, synth, dict(z_cmb=b["z_cmb"], z_hel=b["z_hel"])
        )

    raise KeyError(f"unknown SN dataset {name!r}")


def _des5y_bins(bin_size: int = 50) -> CovDataset:
    """Inverse-variance-weighted equal-count binning of DES5Y including
    the full binned covariance — reference y2024DES/data_bins.py:27-61."""
    full = load_sn("des5y")
    n = full.n
    z, mu, cov = full.z_cmb, full.values, full.cov
    num_bins = int(np.ceil(n / bin_size))
    idx_split = np.array_split(np.arange(n), num_bins)
    weights, z_bins, mu_bins = [], [], []
    for idx in idx_split:
        sub = cov[np.ix_(idx, idx)]
        w = np.sum(np.linalg.inv(sub), axis=1)
        w = w / np.sum(w)
        weights.append(w)
        z_bins.append(np.mean(z[idx]))
        mu_bins.append(np.sum(w * mu[idx]))
    cov_bins = np.zeros((num_bins, num_bins))
    for i in range(num_bins):
        for j in range(num_bins):
            cov_bins[i, j] = weights[i] @ cov[np.ix_(idx_split[i], idx_split[j])] @ weights[j]
    return CovDataset(
        f"DES-SN5YR - {bin_size} bins",
        np.asarray(mu_bins),
        cov_bins,
        full.synthetic_cov,
        dict(z_cmb=np.asarray(z_bins), z_hel=np.asarray(z_bins)),
    )


def load_cc() -> CovDataset:
    """Cosmic chronometers with the Moresco systematic covariance:
    diag(sigma_H^2) + IMF + SPS-odd rank-one components built from
    interpolated percentage errors (reference y2005cc/data.py:14-38)."""
    b = _bundle("cc")
    z, H = b["z"], b["H"]
    imf = np.interp(z, b["comp_z"], b["comp_imf"]) / 100.0
    spsooo = np.interp(z, b["comp_z"], b["comp_spsooo"]) / 100.0
    cov = (
        np.diag(b["sigma_H"] ** 2)
        + np.outer(H * imf, H * imf)
        + np.outer(H * spsooo, H * spsooo)
    )
    return CovDataset(
        f"Cosmic Chronometers ({z.size} data points)",
        H,
        cov,
        False,
        dict(z=z, sigma_H=b["sigma_H"]),
    )


def load_fs8() -> CovDataset:
    """fsigma8 compilation (66 points) with full covariance
    (reference y2018fs8/data.py)."""
    b = _bundle("fs8")
    return CovDataset(
        str(b["legend"]),
        b["fs8"],
        b["cov"],
        False,
        dict(z=b["z"], fs8_err=b["fs8_err"], omega_fid=b["omega_fid"]),
    )


def load_quasars(n_bins: int = 48, sigma_mu_type: str = "sem_errors"):
    """Lusso+2020 quasars binned into equally-populated bins
    (reference y2018quasars/data.py:20-90). Returns (legend, z, mu,
    sigma_mu) numpy arrays; diagonal errors only (the quasar likelihood
    adds an intrinsic-scatter parameter, quasars/qsr_desi.py:68-80).
    """
    import pandas as pd

    b = _bundle("quasars")
    df = pd.DataFrame({"z": b["z"], "mu": b["dm"], "sig": b["e_dm"]}).sort_values("z")
    df["bin"] = pd.qcut(df["z"], q=n_bins, labels=False, duplicates="drop")

    def sig_agg(x):
        x = np.asarray(x)
        if sigma_mu_type == "sem_errors":
            return np.sqrt(np.sum(x**2)) / x.size
        if sigma_mu_type == "sem_data":
            return np.std(x) / np.sqrt(x.size)
        if sigma_mu_type == "rms_errors":
            return np.sqrt(np.sum(x**2) / x.size)
        raise ValueError(sigma_mu_type)

    agg = df.groupby("bin").agg({"z": "mean", "mu": "mean", "sig": sig_agg})
    legend = f"Quasars - {len(agg)} bins"
    return (
        legend,
        agg["z"].to_numpy(np.float64),
        agg["mu"].to_numpy(np.float64),
        agg["sig"].to_numpy(np.float64),
    )
