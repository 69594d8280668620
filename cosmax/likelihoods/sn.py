"""Type Ia supernova likelihoods (Pantheon+, Pantheon+&SH0ES, Union3,
DES-SN5YR, Pantheon 2018, Union2.1).

Theory: one cumulative-trapezoid integral of 1/E on a fixed grid shared
by all SNe, interpolated at the data redshifts — the reference's scheme
(sn/pantheon.py:32-35) kept verbatim because it is already optimal on
TPU (a prefix sum + gather, one per likelihood eval, reused for ~2000
SNe). chi^2 is the whitened-residual matmul against the full covariance.

Magnitude conventions covered (reference parameter naming varies per
script): absolute magnitude 'M' with sampled H0, magnitude offset 'dM'
with fixed H0 (Union3/DES5Y: sn/union3.py:14, sn/des5y.py:12), H0-free
log-distance with the offset absorbing c/H0 (bao/desi_des5y.py:34-37),
and the Cepheid-anchored variant (sn/pantheon_and_sh0es.py:34-45).
"""

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.constants import C_KM_S
from cosmax.likelihoods.base import Term
from cosmax.models.background import e_of_z
from cosmax.ops.quadrature import cumtrapz
from cosmax.ops.linalg import chi2_from_whitener
from cosmax.data.loaders import CovDataset


def _cheb_nodes(k: int, lo: float, hi: float):
    """Chebyshev-Gauss-Lobatto nodes on [lo, hi], ascending, f64."""
    t = np.cos(np.pi * np.arange(k) / (k - 1))[::-1]  # [-1, 1]
    return 0.5 * (lo + hi) + 0.5 * (hi - lo) * t


def _barycentric_matrix(nodes, x):
    """B[len(x), len(nodes)] with (B @ f(nodes)) = the Chebyshev
    interpolant of f evaluated at x (barycentric form, f64 numpy)."""
    k = len(nodes)
    w = np.ones(k)
    w[1::2] = -1.0
    w[0] *= 0.5
    w[-1] *= 0.5
    diff = x[:, None] - nodes[None, :]  # [n, k]
    exact = np.isclose(diff, 0.0, atol=0.0)
    diff = np.where(exact, 1.0, diff)
    num = w[None, :] / diff
    b = num / num.sum(axis=1, keepdims=True)
    b = np.where(exact.any(axis=1, keepdims=True), exact.astype(np.float64), b)
    return b


def build_sn_term(
    dataset: CovDataset,
    model: str,
    mag_param: str = "M",
    h0: str | float = "H0",
    use_z_hel: bool = True,
    grid_num: int = 1000,
    cepheids: bool = False,
    name: str = "sn",
    method: str = "dense",
    cheb_order: int = 32,
    gl_order: int = 64,
) -> Term:
    """h0: a float fixes H0 (Union3/DES5Y use 70); the string name of a
    sampled parameter reads it from the dict; None gives the H0-free
    parameterisation where ``mag_param`` absorbs 5 log10(c/H0) + 25.

    method:
    * ``dense`` (parity path) — the reference scheme verbatim: shared
      cumulative-trapezoid grid + interp, then the whitened-residual
      matmul against the full N x N factor (sn/pantheon.py:32-40).
    * ``compressed`` — exploits that the per-walker theory vector is
      mu_i = const_i + offset + g(z_i) with g a single smooth scalar
      function: g is represented on ``cheb_order`` Chebyshev nodes in
      log z (spectral accuracy: K=32 matches K=96 chi^2 to 1e-9 across
      the CPL prior box, dense or diagonal covariance —
      tests/test_compressed_sn.py), the whitened basis projection
      P = Linv [B | 1] is folded
      at build time, and chi^2 collapses to a (K+1)-dim quadratic form
      chi2_ref - 2 b.dc + dc.G dc — O(K^2) instead of O(N^2) per
      evaluation (~1600x fewer FLOPs for Pantheon+-sized covariances),
      centred on a reference curve so the f32 fast path loses no
      precision to cancellation. g(z_k) uses Gauss-Legendre comoving
      integrals per node.
    * ``emulated`` (fast path) — goes one step further: the only
      theta-dependent part of the compressed coefficient vector is the
      geometry deviation 5 log10(I(z_k; theta)/I_ref), a smooth
      function of the 1-3 dark-energy parameters, while the magnitude
      offset and a sampled H0 both shift mu UNIFORMLY (the -5 log10 h
      term) — i.e. the residual is linear in every non-geometric
      parameter. models.linear_chi2 tabulates the whitened-metric
      coefficient curve on a Chebyshev parameter grid at build time
      and chi^2 collapses to a rank-space contraction + O(R) flops:
      no per-evaluation quadrature or log10 at all (radiation enters
      as the same secant-delta axpy as the fs8 emulator).
    """
    from cosmax.likelihoods.fastmode import fast_mode

    # normalise numeric h0 (int / np.float64) to a Python float so the
    # `isinstance(h0, float)` / `isinstance(h0, str)` dispatch below
    # and in _sn_geometry can't silently drop the -5 log10(h0/70)
    # magnitude shift on the emulated path (ADVICE r4)
    if h0 is not None and not isinstance(h0, str):
        h0 = float(h0)

    if method == "dense" and fast_mode():
        method = "emulated"
    if method == "emulated":
        return _build_emulated_sn(
            dataset, model, mag_param, h0, use_z_hel, cheb_order, gl_order, name,
            cepheids=cepheids,
        )
    if method == "compressed":
        return _build_compressed_sn(
            dataset, model, mag_param, h0, use_z_hel, cheb_order, gl_order, name,
            cepheids=cepheids,
        )
    if method != "dense":
        raise ValueError(f"unknown SN method {method!r}")
    z_cmb = np.asarray(dataset.z_cmb, dtype=np.float64)
    mags = np.asarray(dataset.values, dtype=np.float64)
    one_plus_z_hel = 1.0 + np.asarray(
        dataset.z_hel if use_z_hel else dataset.z_cmb, dtype=np.float64
    )
    linv = dataset.linv
    z_grid = np.linspace(0.0, z_cmb.max(), num=grid_num)
    if cepheids:
        ceph_dist = np.asarray(dataset.ceph_dist, dtype=np.float64)
        ceph_mask = ceph_dist != -9  # sn/pantheon_and_sh0es.py:17

    def theory_mag(p):
        inv_e = 1.0 / e_of_z(jnp.asarray(z_grid), p, model)
        integral = jnp.interp(z_cmb, z_grid, cumtrapz(inv_e, z_grid))
        if h0 is None:
            # H0-free: mu = 25 + 5 log10((1+z_hel) * c * I); the offset
            # parameter absorbs -5 log10(H0) (bao/desi_des5y.py:34-37).
            mu = 25.0 + 5.0 * jnp.log10(one_plus_z_hel * C_KM_S * integral)
        else:
            h0_val = p[h0] if isinstance(h0, str) else h0
            mu = 25.0 + 5.0 * jnp.log10(one_plus_z_hel * (C_KM_S / h0_val) * integral)
        if cepheids:
            mu = jnp.where(ceph_mask, ceph_dist, mu)
        return mu + p[mag_param]

    def chi2(p):
        return chi2_from_whitener(linv, mags - theory_mag(p))

    return Term(
        name=name,
        chi2=chi2,
        meta=dict(
            n=dataset.n,
            legend=dataset.legend,
            theory_mag=theory_mag,
            values=mags,
            linv=linv,
            plot_kind="sn",
            z=z_cmb,
            errors=np.sqrt(np.diag(dataset.cov)),
        ),
    )


def _sn_geometry(dataset, mag_param, h0, use_z_hel, cheb_order, cepheids):
    """Shared build-time f64 geometry of the compressed/emulated SN
    paths: the log-z Chebyshev basis, the whitened basis projection,
    the reference curve and the residual/quadratic-form data."""
    import scipy.integrate

    z_cmb = np.asarray(dataset.z_cmb, dtype=np.float64)
    mags = np.asarray(dataset.values, dtype=np.float64)
    one_plus_z_hel = 1.0 + np.asarray(
        dataset.z_hel if use_z_hel else dataset.z_cmb, dtype=np.float64
    )
    linv = dataset.linv

    if cepheids:
        # Cepheid-anchored rows are parameter-independent constants
        # (mu_i = CEPH_DIST_i + M, sn/pantheon_and_sh0es.py:42-44):
        # fold them into the constant vector and zero their basis rows,
        # so only the magnitude column acts on them.
        ceph_dist = np.asarray(dataset.ceph_dist, dtype=np.float64)
        cal_mask = ceph_dist != -9
    else:
        cal_mask = np.zeros(z_cmb.size, dtype=bool)

    hubble_flow = ~cal_mask
    u_data = np.where(hubble_flow, np.log(z_cmb), 0.0)
    nodes_u = _cheb_nodes(
        cheb_order, u_data[hubble_flow].min(), u_data[hubble_flow].max()
    )
    z_nodes = np.exp(nodes_u)
    b_mat = _barycentric_matrix(nodes_u, u_data)  # [N, K]
    b_mat[cal_mask] = 0.0
    b_tilde = np.concatenate([b_mat, np.ones((z_cmb.size, 1))], axis=1)
    p_mat = linv @ b_tilde  # [N, K+1]

    const = 25.0 + 5.0 * np.log10(one_plus_z_hel)
    if cepheids:
        const = np.where(cal_mask, np.asarray(dataset.ceph_dist), const)
    d_prime = mags - const

    # reference curve: flat LCDM Om=0.3 at the fixed/typical H0
    h0_ref = h0 if isinstance(h0, float) else 70.0
    e_ref = lambda zz: np.sqrt(0.3 * (1.0 + zz) ** 3 + 0.7)
    i_ref = np.array(
        [
            scipy.integrate.quad(lambda zz: 1.0 / e_ref(zz), 0.0, zk)[0]
            for zk in z_nodes
        ]
    )
    if h0 is None:
        g_ref = 5.0 * np.log10(C_KM_S * i_ref)
        offset_ref = -9.2  # typical H0-free offset (bao/desi_des5y.py bounds)
    else:
        g_ref = 5.0 * np.log10((C_KM_S / h0_ref) * i_ref)
        offset_ref = -19.35 if mag_param == "M" else 0.0
    c_ref = np.concatenate([g_ref, [offset_ref]])

    u_ref = linv @ d_prime - p_mat @ c_ref  # whitened residual at ref
    return dict(
        z_cmb=z_cmb,
        mags=mags,
        linv=linv,
        z_nodes=z_nodes,
        b_tilde=b_tilde,
        p_mat=p_mat,
        const=const,
        h0_ref=h0_ref,
        i_ref=i_ref,
        offset_ref=offset_ref,
        c_ref=c_ref,
        u_ref=u_ref,
    )


def _build_compressed_sn(
    dataset, model, mag_param, h0, use_z_hel, cheb_order, gl_order, name,
    cepheids: bool = False,
):
    from cosmax.models.distances import make_prefix_comoving_integral

    geo = _sn_geometry(dataset, mag_param, h0, use_z_hel, cheb_order, cepheids)
    z_cmb, mags, linv = geo["z_cmb"], geo["mags"], geo["linv"]
    z_nodes, b_tilde, p_mat = geo["z_nodes"], geo["b_tilde"], geo["p_mat"]
    const, c_ref, u_ref = geo["const"], geo["c_ref"], geo["u_ref"]
    chi2_ref = float(u_ref @ u_ref)
    b_vec = p_mat.T @ u_ref  # [K+1]
    gram = p_mat.T @ p_mat  # [K+1, K+1]

    # shared-panel prefix quadrature over the sorted Chebyshev nodes:
    # K panels of gl_order/8 nodes instead of K independent big rules
    # 6-node panels between consecutive Chebyshev z-nodes: worst dmu vs
    # order-32 panels is 1e-15 mag over the CPL prior box (even order 4
    # is 3e-14); SN sigma ~ 0.03-0.3 mag.
    prefix_integral = make_prefix_comoving_integral(
        z_nodes, model, order=max(6, gl_order // 16)
    )

    def coeffs(p):
        integral = prefix_integral(p)
        if h0 is None:
            g = 5.0 * jnp.log10(C_KM_S * integral)
        else:
            h0_val = p[h0] if isinstance(h0, str) else h0
            g = 5.0 * jnp.log10((C_KM_S / h0_val) * integral)
        return jnp.concatenate(
            [g, jnp.reshape(p[mag_param], (1,))]
        ) - jnp.asarray(c_ref, dtype=g.dtype)

    from cosmax.ops.linalg import pdot

    def chi2(p):
        dc = coeffs(p)
        return chi2_ref - 2.0 * pdot(jnp.asarray(b_vec, dtype=dc.dtype), dc) + pdot(
            dc, pdot(jnp.asarray(gram, dtype=dc.dtype), dc)
        )

    def theory_mag(p):
        dc = coeffs(p)
        full = pdot(jnp.asarray(b_tilde), dc + jnp.asarray(c_ref, dtype=dc.dtype))
        return jnp.asarray(const) + full

    return _sn_term(name, dataset, chi2, theory_mag, "compressed")


def _build_emulated_sn(
    dataset, model, mag_param, h0, use_z_hel, cheb_order, gl_order, name,
    cepheids: bool = False,
):
    """Parameter-grid rank-space SN chi^2 (see build_sn_term docstring).

    The whitened residual at walker p is

        r(p) = u_ref - P_g (g(theta, h) - g_ref) - (mag - offset_ref) w_M

    with P_g = Linv B the whitened log-z Chebyshev basis and
    g(theta, h) - g_ref = ghat(theta) - 5 log10(h/h_ref) 1_K, where
    ghat(theta) = 5 log10(I(z_k; theta) / I_ref) is the pure-geometry
    deviation. Thin-QR P_g = Q R and emulate the whitened-metric
    coefficient curve c(theta) = R ghat(theta): the magnitude column
    w_M = Linv 1 and the uniform-shift column P_g 1_K are FIXED
    vectors, so models.linear_chi2 covers the whole term with beta = 1
    and gamma = (mag - offset_ref, -5 log10(h/h_ref)).
    """
    from cosmax.models.distances import make_prefix_comoving_integral
    from cosmax.models.linear_chi2 import _hash_arrays, make_linear_chi2

    geo = _sn_geometry(dataset, mag_param, h0, use_z_hel, cheb_order, cepheids)
    z_nodes, p_mat, i_ref = geo["z_nodes"], geo["p_mat"], geo["i_ref"]
    u_ref, offset_ref = geo["u_ref"], geo["offset_ref"]
    h0_ref = geo["h0_ref"]

    k = z_nodes.size
    p_g = p_mat[:, :k]
    q_basis, r_q = np.linalg.qr(p_g)  # P_g = Q R, Q [N, K] orthonormal
    log10_i_ref = np.log10(i_ref)

    # build-time quadrature: 16-node GL panels between Chebyshev nodes
    # (runtime panels use 6; dmu converges to ~1e-15 well below that)
    build_order = 16

    def curve_fn(flat, to_params):
        prefix = make_prefix_comoving_integral(
            z_nodes, model, order=build_order
        )

        def one(theta):
            integral = prefix(to_params(theta))
            ghat = 5.0 * (jnp.log10(integral) - jnp.asarray(log10_i_ref))
            return jnp.tensordot(jnp.asarray(r_q), ghat, axes=(1, 0))

        return np.asarray(jax.vmap(one)(jnp.asarray(flat, jnp.float64)))

    # fixed residual columns: the magnitude direction, plus the uniform
    # -5 log10(h/h_ref) shift when H0 is sampled (both act only through
    # the hubble-flow basis rows; cepheid rows have zeroed b_mat rows)
    w_cols = [p_mat[:, k]]
    sampled_h0 = isinstance(h0, str)
    if sampled_h0:
        w_cols.append(p_g @ np.ones(k))
    w_full = np.stack(w_cols, axis=1)  # [N, J]

    if sampled_h0:
        h0_name = h0

        def gamma_fn(p):
            return jnp.stack([
                p[mag_param] - offset_ref,
                -5.0 * jnp.log10(p[h0_name] / h0_ref),
            ])
    else:

        def gamma_fn(p):
            return jnp.reshape(p[mag_param] - offset_ref, (1,))

    chi2 = make_linear_chi2(
        model,
        curve_fn,
        tag=f"sn-{model}",
        key_extra=_hash_arrays(z_nodes, r_q, log10_i_ref)
        + f"-o{build_order}",
        u0_c=q_basis.T @ u_ref,
        u0_sq=float(u_ref @ u_ref),
        w_c=q_basis.T @ w_full,
        q0=w_full.T @ u_ref,
        s_mat=w_full.T @ w_full,
        gamma_fn=gamma_fn,
    )

    # plots evaluate the theory curve off the hot path: reuse the
    # compressed representation (prefix quadrature + basis expansion)
    b_tilde, const, c_ref = geo["b_tilde"], geo["const"], geo["c_ref"]
    prefix_integral = make_prefix_comoving_integral(
        z_nodes, model, order=max(6, gl_order // 16)
    )

    def theory_mag(p):
        integral = prefix_integral(p)
        if h0 is None:
            g = 5.0 * jnp.log10(C_KM_S * integral)
        else:
            h0_val = p[h0] if isinstance(h0, str) else h0
            g = 5.0 * jnp.log10((C_KM_S / h0_val) * integral)
        coef = jnp.concatenate([g, jnp.reshape(p[mag_param], (1,))])
        from cosmax.ops.linalg import pdot

        return jnp.asarray(const) + pdot(jnp.asarray(b_tilde), coef)

    return _sn_term(name, dataset, chi2, theory_mag, "emulated")


def _sn_term(name, dataset, chi2, theory_mag, method):
    return Term(
        name=name,
        chi2=chi2,
        meta=dict(
            n=dataset.n,
            legend=dataset.legend,
            theory_mag=theory_mag,
            values=np.asarray(dataset.values, dtype=np.float64),
            linv=dataset.linv,
            method=method,
            plot_kind="sn",
            z=np.asarray(dataset.z_cmb, dtype=np.float64),
            errors=np.sqrt(np.diag(dataset.cov)),
        ),
    )
