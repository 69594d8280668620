"""Offline tests of the covariance download hooks (cosmax.data.fetch).

The HTTP step needs network (absent on this box); everything after it
— release-format parsing, z-sort permutation with its integrity
cross-check, and the in-place store patch — is pure file
transformation and is exercised here on synthetic bundles.
"""

import gzip
import os

import numpy as np
import pytest

from cosmax.data.fetch import parse_cov, parse_redshifts, patch_store


def _spd(n, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_parse_cov_nfirst_and_gzip():
    cov = _spd(5, 0)
    text = "5\n" + "\n".join(f"{v:.17g}" for v in cov.ravel())
    out = parse_cov(text.encode(), "nfirst")
    assert np.allclose(out, cov)
    out = parse_cov(gzip.compress(text.encode()), "nfirst")
    assert np.allclose(out, cov)
    with pytest.raises(ValueError, match="expected"):
        parse_cov(b"3\n1.0 2.0", "nfirst")


def test_parse_cov_dense():
    cov = _spd(4, 1)
    text = "\n".join("\t".join(f"{v:.17g}" for v in row) for row in cov)
    assert np.allclose(parse_cov(text.encode(), "dense"), cov)
    with pytest.raises(ValueError, match="square"):
        parse_cov(b"1.0 2.0 3.0", "dense")


def test_parse_redshifts():
    csv = b"CID,zHD,MU\na,0.3,35\nb,0.1,33\n"
    assert np.allclose(parse_redshifts(csv, "des5y"), [0.3, 0.1])
    tsv = b"# Union2.1\nSN1\t0.5\t42.0\t0.2\nSN2\t0.2\t40.0\t0.1\n"
    assert np.allclose(parse_redshifts(tsv, "union21"), [0.5, 0.2])


def test_patch_store_des5y_sorts_verbatim(tmp_path):
    """The release matrix is stored VERBATIM (only z-sorted): the
    reference consumer adds diag(MUERR_FINAL^2) on top of its
    same-named covariance_stat_sys file (y2024DES/data.py:18-20) and
    the loader reproduces that — subtracting diag(mu_err^2) here (the
    old behaviour) baked in an unverifiable assumption about the
    release diagonal and would have skewed every des5y chi2 if wrong."""
    raw_z = np.array([0.4, 0.1, 0.3])
    order = np.argsort(raw_z)
    mu_err = np.array([0.2, 0.1, 0.15])[order]
    np.savez(
        tmp_path / "des5y.npz",
        z_hd=raw_z[order], mu_err=mu_err,
        mu=np.zeros(3), z_hel=raw_z[order],
        effective_sample_size=np.int64(3),
        legend=np.array("synthetic"),
    )
    stat_sys_raw = _spd(3, 2)
    patch_store("des5y", stat_sys_raw, raw_z=raw_z, store=str(tmp_path))
    b = np.load(tmp_path / "des5y.npz")
    expect = stat_sys_raw[np.ix_(order, order)]
    assert np.allclose(b["cov_sys"], expect)

    # integrity check: mismatched release redshifts must refuse
    with pytest.raises(ValueError, match="do not match"):
        patch_store(
            "des5y", stat_sys_raw, raw_z=raw_z + 0.01, store=str(tmp_path)
        )
    # z-sorted dataset without the companion table must refuse
    with pytest.raises(ValueError, match="companion"):
        patch_store("des5y", stat_sys_raw, store=str(tmp_path))


def test_patch_store_pantheon18_direct(tmp_path):
    # the release sys matrix is in lcparam row order, the store is
    # z-sorted: the companion permutation is REQUIRED and applied
    raw_z = np.array([0.5, 0.1, 0.9, 0.3])
    order = np.argsort(raw_z)
    np.savez(
        tmp_path / "pantheon18.npz",
        mb=np.zeros(4), dmb=np.full(4, 0.1),
        z_cmb=raw_z[order], z_hel=raw_z[order],
        legend=np.array("synthetic"),
    )
    sys = _spd(4, 3)
    patch_store("pantheon18", sys, raw_z=raw_z, store=str(tmp_path))
    b = np.load(tmp_path / "pantheon18.npz")
    assert np.allclose(b["cov_sys"], sys[np.ix_(order, order)])
    # without the companion table it must refuse, not store misaligned
    with pytest.raises(ValueError, match="companion"):
        patch_store("pantheon18", sys, store=str(tmp_path))
    # wrong size refuses
    with pytest.raises(ValueError, match="rows"):
        patch_store(
            "pantheon18", _spd(5, 4), raw_z=np.linspace(0.1, 1, 5),
            store=str(tmp_path),
        )


def test_patch_store_refuses_asymmetric(tmp_path):
    np.savez(
        tmp_path / "pantheon18.npz",
        mb=np.zeros(4), dmb=np.full(4, 0.1),
        z_cmb=np.linspace(0.1, 1, 4), z_hel=np.linspace(0.1, 1, 4),
        legend=np.array("synthetic"),
    )
    bad = _spd(4, 6)
    bad[0, 1] += 10.0  # gross asymmetry = mis-parsed payload
    with pytest.raises(ValueError, match="asymmetric"):
        patch_store("pantheon18", bad, store=str(tmp_path))


# -- full download -> parse -> permute -> patch -> postcheck pipeline ----
# (golden few-KB fixtures mimicking each release format, urlopen stubbed)


class _FakeResponse:
    def __init__(self, payload: bytes):
        self._payload = payload

    def read(self):
        return self._payload

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _stub_urlopen(monkeypatch, payloads: dict):
    """payloads: url -> bytes; anything else is a test bug.
    fetch() imports urlopen from urllib.request at call time, so
    patching the module attribute intercepts the download."""
    import urllib.request

    def fake(url, timeout=None):
        if url not in payloads:
            raise AssertionError(f"unexpected URL {url}")
        return _FakeResponse(payloads[url])

    monkeypatch.setattr(urllib.request, "urlopen", fake)


def _nfirst_payload(cov, gz=False):
    # ragged header line (N) followed by one float per line — the
    # Pantheon+/DES5Y/Pantheon18 release layout
    text = f"{cov.shape[0]}\n" + "\n".join(
        f"{v:.17g}" for v in cov.ravel()
    )
    raw = text.encode()
    return gzip.compress(raw) if gz else raw


def test_fetch_full_pipeline_des5y(tmp_path, monkeypatch):
    """fetch('des5y') end-to-end minus the socket: gz nfirst payload,
    csv companion, z-sort permutation, verbatim cov_sys, sha256
    provenance recorded in the bundle."""
    import hashlib

    import cosmax.data.fetch as fetch_mod

    raw_z = np.array([0.4, 0.1, 0.3])
    order = np.argsort(raw_z)
    mu_err = np.array([0.2, 0.1, 0.15])[order]
    np.savez(
        tmp_path / "des5y.npz",
        z_hd=raw_z[order], mu_err=mu_err,
        mu=np.zeros(3), z_hel=raw_z[order],
        effective_sample_size=np.int64(3),
        legend=np.array("synthetic"),
    )
    cov = _spd(3, 7)
    url, fmt, companion = fetch_mod._URLS["des5y"]
    payload = _nfirst_payload(cov, gz=True)
    csv = b"CID,zHD,MU\na,0.4,35\nb,0.1,33\nc,0.3,34\n"
    _stub_urlopen(monkeypatch, {url: payload, companion: csv})
    monkeypatch.setitem(fetch_mod._EXPECTED_N, "des5y", 3)

    path = fetch_mod.fetch("des5y", store=str(tmp_path))
    b = np.load(path)
    assert np.allclose(b["cov_sys"], cov[np.ix_(order, order)], atol=1e-12)
    assert str(b["cov_fetch_sha256"]) == hashlib.sha256(payload).hexdigest()
    assert str(b["cov_fetch_url"]) == url


def test_fetch_rejects_sha_and_size_drift(tmp_path, monkeypatch):
    import cosmax.data.fetch as fetch_mod

    np.savez(
        tmp_path / "pantheon18.npz",
        mb=np.zeros(4), dmb=np.full(4, 0.1),
        z_cmb=np.linspace(0.1, 1, 4), z_hel=np.linspace(0.1, 1, 4),
        legend=np.array("synthetic"),
    )
    cov = _spd(4, 8)
    url, _, companion = fetch_mod._URLS["pantheon18"]
    lcparam = (
        b"#name zcmb zhel dz mb dmb\n"
        b"a 0.1 0.1 0 20 0.1\nb 0.4 0.4 0 21 0.1\n"
        b"c 0.7 0.7 0 22 0.1\nd 1.0 1.0 0 23 0.1\n"
    )
    _stub_urlopen(
        monkeypatch, {url: _nfirst_payload(cov), companion: lcparam}
    )
    # size drift: payload is 4^2, published dataset is 1048^2
    with pytest.raises(ValueError, match="format drift"):
        fetch_mod.fetch("pantheon18", store=str(tmp_path))
    # sha drift: pin something else
    monkeypatch.setitem(fetch_mod._EXPECTED_N, "pantheon18", 4)
    monkeypatch.setitem(fetch_mod._SHA256, "pantheon18", "0" * 64)
    with pytest.raises(ValueError, match="sha256"):
        fetch_mod.fetch("pantheon18", store=str(tmp_path))
    # correct pin passes (already-sorted companion: identity perm)
    import hashlib

    monkeypatch.setitem(
        fetch_mod._SHA256, "pantheon18",
        hashlib.sha256(_nfirst_payload(cov)).hexdigest(),
    )
    path = fetch_mod.fetch("pantheon18", store=str(tmp_path))
    assert np.allclose(np.load(path)["cov_sys"], cov, atol=1e-12)


def test_fetch_full_pipeline_pantheon18_permutes(tmp_path, monkeypatch):
    """fetch('pantheon18') end-to-end minus the socket: the lcparam
    companion's zcmb column yields the argsort permutation applied to
    the sys matrix (the regression this pins: storing the release
    matrix verbatim paired each row with the wrong supernova)."""
    import cosmax.data.fetch as fetch_mod

    raw_z = np.array([0.5, 0.1, 0.9, 0.3])
    order = np.argsort(raw_z)
    np.savez(
        tmp_path / "pantheon18.npz",
        mb=np.zeros(4), dmb=np.full(4, 0.1),
        z_cmb=raw_z[order], z_hel=raw_z[order],
        legend=np.array("synthetic"),
    )
    cov = _spd(4, 5)
    url, _, companion = fetch_mod._URLS["pantheon18"]
    lcparam = b"#name zcmb zhel dz mb dmb\n" + b"".join(
        f"sn{i} {z:.17g} {z:.17g} 0 20 0.1\n".encode()
        for i, z in enumerate(raw_z)
    )
    _stub_urlopen(
        monkeypatch, {url: _nfirst_payload(cov), companion: lcparam}
    )
    monkeypatch.setitem(fetch_mod._EXPECTED_N, "pantheon18", 4)
    path = fetch_mod.fetch("pantheon18", store=str(tmp_path))
    b = np.load(path)
    assert np.allclose(b["cov_sys"], cov[np.ix_(order, order)], atol=1e-12)
    # a companion whose sorted z disagrees with the store must refuse
    bad = lcparam.replace(b"0.9", b"0.95")
    _stub_urlopen(
        monkeypatch, {url: _nfirst_payload(cov), companion: bad}
    )
    with pytest.raises(ValueError, match="row order has changed"):
        fetch_mod.fetch("pantheon18", store=str(tmp_path))


def test_postcheck_detects_convention_error(monkeypatch):
    """A patched covariance that cannot reproduce the published chi2
    aborts with a convention diagnosis (the guard that would have
    caught a diag(mu_err^2) double-count on first real contact)."""
    import cosmax.data.fetch as fetch_mod

    monkeypatch.setitem(
        fetch_mod._POSTCHECKS, "des5y",
        ("bao.desi", {"h": 0.690, "Om": 0.298}, 10.27),
    )
    # passes against the real published anchor (chi2 10.2753)
    assert abs(fetch_mod.postcheck("des5y")) < 0.1
    # a wrong covariance convention = chi2 far off the published value
    monkeypatch.setitem(
        fetch_mod._POSTCHECKS, "des5y",
        ("bao.desi", {"h": 0.690, "Om": 0.298}, 500.0),
    )
    with pytest.raises(ValueError, match="convention"):
        fetch_mod.postcheck("des5y")


def test_patched_bundle_loads_with_full_covariance(tmp_path, monkeypatch):
    """After the patch, the loader must report synthetic_cov=False and
    use cov_sys + diag."""
    import cosmax.data.loaders as loaders

    store_src = os.path.join(os.path.dirname(loaders.__file__), "store")
    src = dict(np.load(os.path.join(store_src, "pantheon18.npz")))
    src.pop("cov_sys", None)
    np.savez(tmp_path / "pantheon18.npz", **src)

    monkeypatch.setattr(loaders, "_STORE", str(tmp_path))
    loaders._bundle.cache_clear()
    try:  # drop the tmp-store entries again however the test exits
        before = loaders.load_sn("pantheon18")
        assert before.synthetic_cov

        n = len(src["mb"])
        sys = _spd(n, 5) * 1e-4
        # store z is already sorted -> identity permutation
        patch_store(
            "pantheon18", sys, raw_z=src["z_cmb"], store=str(tmp_path)
        )
        after = loaders.load_sn("pantheon18")  # patch_store cleared the cache
        assert not after.synthetic_cov
        assert np.allclose(
            after.cov, 0.5 * (sys + sys.T) + np.diag(src["dmb"] ** 2)
        )
    finally:
        loaders._bundle.cache_clear()
