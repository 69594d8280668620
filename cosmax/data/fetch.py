"""Download hooks for the large systematic covariances stripped from
the mounted reference checkout (reference .MISSING_LARGE_BLOBS:1-5).

The four matrices exist in public data releases; this module downloads
them, converts each release format into the array the cosmax loaders
expect (cosmax/data/loaders.py:169-236), and patches the existing
store bundle in place — after which the affected datasets load their
full covariance (``synthetic_cov=False``) and the published rows in
BASELINE.md become verifiable.

Usage (needs network)::

    python -m cosmax.data.fetch            # all four
    python -m cosmax.data.fetch pantheon_plus des5y

Release formats handled:

* ``nfirst`` — first whitespace token is N, followed by N*N floats
  (Pantheon+SH0ES ``Pantheon+SH0ES_STAT+SYS.cov``, reference consumer
  y2022pantheonSHOES/data.py:9-18; DES-SN5YR ``STAT+SYS.txt.gz``,
  y2024DES/data.py:18-20; Pantheon 2018 ``sys_full_long.txt``,
  y2018pantheon/data.py:17)
* ``dense`` — plain N x N whitespace/tab table (SCP Union2.1
  ``SCPUnion2.1_covmat_sys.txt``, y2011union2/data.py:9-19)

Per-dataset conversion to the store keys:

* ``pantheon_plus``: the release matrix is stat+sys in the SH0ES frame
  and 1701-row release order = store row order -> saved as ``cov``.
* ``des5y``: the release matrix is STAT+SYS in release row order; the
  store is z-sorted (ingest_des5y), so the companion hubble-diagram
  file is fetched to compute the argsort(zHD) permutation (and the
  sorted zHD are cross-checked against the bundle); the systematic
  part the loader expects (it re-adds diag(mu_err^2), loaders.py:185)
  is then obtained by subtracting diag(mu_err^2).
* ``union21``: full systematic covariance in release row order; the
  store is z-sorted, so the companion mu-vs-z table provides the
  permutation, cross-checked the same way -> saved as ``cov``.
* ``pantheon18``: systematics-only matrix in lcparam row order = store
  row order -> ``cov_sys`` (the loader re-adds diag(dmb^2),
  loaders.py:232).
"""

import argparse
import gzip
import os
import sys

import numpy as np

from cosmax.data.ingest import STORE

_URLS = {
    "pantheon_plus": (
        "https://raw.githubusercontent.com/PantheonPlusSH0ES/DataRelease/"
        "main/Pantheon%2B_Data/4_DISTANCES_AND_COVAR/"
        "Pantheon%2BSH0ES_STAT%2BSYS.cov",
        "nfirst",
        None,
    ),
    "des5y": (
        "https://raw.githubusercontent.com/des-science/DES-SN5YR/main/"
        "4_DISTANCES_COVMAT/STAT%2BSYS.txt.gz",
        "nfirst",
        # companion: zHD column -> sort permutation
        "https://raw.githubusercontent.com/des-science/DES-SN5YR/main/"
        "4_DISTANCES_COVMAT/DES-SN5YR_HD.csv",
    ),
    "union21": (
        "https://supernova.lbl.gov/Union/figures/SCPUnion2.1_covmat_sys.txt",
        "dense",
        "https://supernova.lbl.gov/Union/figures/SCPUnion2.1_mu_vs_z.txt",
    ),
    "pantheon18": (
        "https://raw.githubusercontent.com/dscolnic/Pantheon/master/"
        "sys_full_long.txt",
        "nfirst",
        None,
    ),
}


def parse_redshifts(raw: bytes, dataset: str) -> np.ndarray:
    """Extract the redshift column (release row order) from a dataset's
    companion table."""
    text = raw.decode("utf-8", errors="replace")
    if dataset == "des5y":
        # csv with a zHD column
        rows = [ln.split(",") for ln in text.splitlines() if ln.strip()]
        col = [c.strip() for c in rows[0]].index("zHD")
        return np.array([float(r[col]) for r in rows[1:]])
    if dataset == "union21":
        # '#'-commented, tab-separated: name, z, mu, err[, p_host]
        vals = [
            ln.split("\t")[1]
            for ln in text.splitlines()
            if ln.strip() and not ln.lstrip().startswith("#")
        ]
        return np.array([float(v) for v in vals])
    raise ValueError(f"no companion parser for {dataset!r}")


def parse_cov(raw: bytes, fmt: str) -> np.ndarray:
    """Parse a downloaded covariance in one of the release formats."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    # whitespace tokenisation, not loadtxt: the nfirst layout has a
    # ragged first row (the N header) that loadtxt refuses
    vals = np.array(raw.split(), dtype=np.float64)
    if fmt == "nfirst":
        n = int(round(vals[0]))
        body = vals[1:]
        if body.size != n * n:
            raise ValueError(f"expected {n}*{n} values, got {body.size}")
        return body.reshape(n, n)
    if fmt == "dense":
        n = int(round(np.sqrt(vals.size)))
        if n * n != vals.size:
            raise ValueError(f"not a square table: {vals.size} values")
        return vals.reshape(n, n)
    raise ValueError(f"unknown format {fmt!r}")


def patch_store(
    dataset: str, cov: np.ndarray, raw_z: np.ndarray = None, store: str = None
) -> str:
    """Convert ``cov`` to the loader's store key and rewrite the npz
    bundle. ``raw_z`` is the release-row-order redshift column for the
    z-sorted datasets (des5y, union21): it yields the permutation and
    an integrity cross-check against the bundle. Pure file
    transformation — unit tested offline (tests/test_fetch.py)."""
    store = store or STORE
    path = os.path.join(store, f"{dataset}.npz")
    b = dict(np.load(path, allow_pickle=False))
    cov = np.asarray(cov, dtype=np.float64)
    cov = 0.5 * (cov + cov.T)

    def zsort(bundle_z):
        if raw_z is None:
            raise ValueError(
                f"{dataset} store rows are z-sorted; the companion "
                "redshift table is required to permute the covariance"
            )
        order = np.argsort(np.asarray(raw_z, dtype=np.float64))
        if not np.allclose(np.asarray(raw_z)[order], bundle_z, atol=1e-8):
            raise ValueError(
                f"{dataset}: sorted release redshifts do not match the "
                "store bundle — release row order has changed upstream"
            )
        return cov[np.ix_(order, order)]

    if dataset == "pantheon_plus":
        _check_shape(cov, len(b["m_b_corr"]))
        b["cov"] = cov
    elif dataset == "des5y":
        _check_shape(cov, len(b["mu_err"]))
        c = zsort(b["z_hd"])
        # release ships STAT+SYS; the loader re-adds diag(mu_err^2)
        b["cov_sys"] = c - np.diag(b["mu_err"] ** 2)
    elif dataset == "union21":
        _check_shape(cov, len(b["mu"]))
        b["cov"] = zsort(b["z"])
    elif dataset == "pantheon18":
        _check_shape(cov, len(b["mb"]))
        b["cov_sys"] = cov
    else:
        raise ValueError(f"unknown dataset {dataset!r}")

    np.savez_compressed(path, **b)
    # a long-lived process must see the patched bundle on next load
    from cosmax.data.loaders import _bundle

    _bundle.cache_clear()
    return path


def _check_shape(cov, n):
    if cov.shape != (n, n):
        raise ValueError(f"covariance is {cov.shape}, dataset has {n} rows")


def fetch(dataset: str, store: str = None, timeout: float = 120.0) -> str:
    """Download one dataset's covariance and patch its store bundle."""
    from urllib.request import urlopen

    url, fmt, companion = _URLS[dataset]
    print(f"fetching {dataset}: {url}")
    with urlopen(url, timeout=timeout) as r:
        raw = r.read()
    cov = parse_cov(raw, fmt)
    raw_z = None
    if companion is not None:
        with urlopen(companion, timeout=timeout) as r:
            raw_z = parse_redshifts(r.read(), dataset)
    path = patch_store(dataset, cov, raw_z=raw_z, store=store)
    print(f"patched {path} ({cov.shape[0]}^2 covariance)")
    return path


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="cosmax.data.fetch", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("datasets", nargs="*", default=None,
                   help=f"subset of {sorted(_URLS)} (default: all)")
    p.add_argument("--store", default=None, help="alternate store dir")
    args = p.parse_args(argv)
    names = args.datasets or sorted(_URLS)
    failures = []
    for name in names:
        if name not in _URLS:
            p.error(f"unknown dataset {name!r}; choose from {sorted(_URLS)}")
        try:
            fetch(name, store=args.store)
        except Exception as e:
            failures.append(name)
            print(f"FAILED {name}: {e}", file=sys.stderr)
    if failures:
        print(
            f"{len(failures)} fetch(es) failed ({', '.join(failures)}) — "
            "offline? The loaders keep their documented fallback "
            "(diagonal statistical covariance, synthetic_cov=True).",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
