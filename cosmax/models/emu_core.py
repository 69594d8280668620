"""Shared machinery for build-time Chebyshev emulators.

Everything a rank-space chi^2 emulator needs, independent of WHAT is
being emulated: the f64 build context, the parameter-domain registry,
Chebyshev node/barycentric helpers, the content-addressed on-disk
table cache, the truncated-SVD rank factorisation with its
delta-subspace refinement, and the Tucker/tensor-train coefficient
compression with composed end-to-end verification.

Consumers:

* :mod:`cosmax.models.growth_emulator` — the fsigma8 value and
  whitened-chi2 emulators (the original home of this code; its public
  API and the docstrings explaining each algorithm's rationale are
  unchanged).
* :mod:`cosmax.models.linear_chi2` — the generic rank-space emulator
  for whitened chi^2 terms that are linear in their non-geometric
  parameters (SN / CC / BAO fast paths).

Every function here is build-time-only except :func:`bary_vector` and
:func:`coeff_contract`, the two jittable runtime primitives.
"""

import hashlib
import os
import tempfile
from contextlib import contextmanager, nullcontext
from itertools import permutations

import numpy as np
import jax
import jax.numpy as jnp


@contextmanager
def f64_build():
    """Build-time node tables are ALWAYS computed in f64 on the CPU
    backend, whatever the runtime precision (ARCHITECTURE.md precision
    policy: "build-time constants: f64 numpy, always").

    This is load-bearing for the factorisation ranks, not cosmetic: an
    f32 solve leaves ~5e-6 absolute rounding noise in the O(20) whitened
    tables, and the radiation DELTA tables (max ~0.3) sit only ~4-5
    orders above that — their singular spectrum develops a noise plateau
    ABOVE the 1e-6*max|base| truncation tolerance, so the rank selection
    chases noise to full rank (measured on the wzcdm chi2 term: delta
    rank 23 -> 130 with the exact-table fallback, 169k vs ~25k
    flops/eval; the base table inflates too, R 23 -> 35).
    """
    try:
        cpu = jax.devices("cpu")
    except RuntimeError:  # platform hidden (e.g. JAX_PLATFORMS pins)
        cpu = []
    dev = jax.default_device(cpu[0]) if cpu else nullcontext()
    with dev, jax.enable_x64(True):
        yield


# generous default domains covering every preset's prior box
DOMAINS = {
    "Om": (0.03, 0.75),
    "w0": (-3.2, 0.6),
    "wa": (-3.5, 2.6),
}

# Radiation linearisation point for the chi2 emulators: Or = orh2 / h^2
# tops out around 4.2e-5 / 0.5^2 ~ 1.7e-4 over every preset's H0 box,
# so a secant through (0, OR_REF) brackets the realistic range and the
# in-range curvature error is O(OR_REF^2) — measured < 2e-4 in chi2.
OR_REF = 2e-4

# For 3-axis (w0wacdm) grids the radiation-correction program lives on
# this coarser per-axis node grid (2 x 2 x 20^3 extra solves instead of
# 2 x 2 x 40^3). The Or delta is small over the realistic box and its
# Chebyshev tail decays to 7.5e-5 at 20 nodes (measured on the 2-D
# family) — the induced chi2 error is ~1e-4*t, far under the base
# truncation contract. 1-2 axis grids build the correction on the full
# grid.
OR_DELTA_NODES = 20

MODEL_PARAMS = {
    "lcdm": ("Om",),
    "wcdm": ("Om", "w0"),
    "wzcdm": ("Om", "w0"),
    "w0wacdm": ("Om", "w0", "wa"),
}


def cheb_nodes(n, lo, hi):
    """Chebyshev-Gauss-Lobatto nodes on [lo, hi], ascending, f64."""
    t = np.cos(np.pi * np.arange(n) / (n - 1))[::-1]
    return 0.5 * (lo + hi) + 0.5 * (hi - lo) * t


def bary_weights(n):
    w = np.ones(n)
    w[1::2] = -1.0
    w[0] *= 0.5
    w[-1] *= 0.5
    return w


def flatten_grid(axes):
    grids = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=1)


def bary_vector(x, nodes, bw):
    """Barycentric interpolation weight vector at scalar x (jittable)."""
    diff = x - nodes
    near = jnp.abs(diff) < 1e-14
    safe = jnp.where(near, 1.0, diff)
    num = bw / safe
    w = num / jnp.sum(num)
    return jnp.where(jnp.any(near), near.astype(w.dtype), w)


def bary_vector_np(x, nodes):
    """f64 numpy barycentric weight vector (build-time reference-point
    evaluation)."""
    bw = bary_weights(len(nodes))
    diff = np.asarray(x, np.float64) - nodes
    if np.any(diff == 0.0):
        return (diff == 0.0).astype(np.float64)
    num = bw / diff
    return num / num.sum()


# ---------------------------------------------------------------------------
# content-addressed on-disk table cache

_TABLE_MEMO = {}

# The numeric-code files whose behaviour the node tables depend on.
# Their bytes are folded into every disk-cache key, so ANY edit to the
# solver/quadrature stack invalidates cached tables — content
# addressing, not versioning, which a test run cannot be fooled by.
_SOLVER_SOURCES = (
    "models/growth.py",
    "models/growth_emulator.py",
    "models/emu_core.py",
    "models/linear_chi2.py",
    "models/background.py",
    "models/distances.py",
    "ops/ode.py",
    "ops/quadrature.py",
    # likelihood modules whose curve_fn bodies (BAO build panels,
    # CC/SN assembly) determine linear_chi2 table contents — edits to
    # them must invalidate cached tables too (ADVICE r4)
    "likelihoods/bao.py",
    "likelihoods/cc.py",
    "likelihoods/sn.py",
    "likelihoods/fs8.py",
    "likelihoods/quasars.py",
)
_SOURCE_HASH = None


def solver_source_hash():
    global _SOURCE_HASH
    if _SOURCE_HASH is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for rel in _SOLVER_SOURCES:
            with open(os.path.join(root, rel), "rb") as f:
                h.update(f.read())
        _SOURCE_HASH = h.hexdigest()
    return _SOURCE_HASH


def table_cache_path(kind, key):
    """Content-addressed on-disk location for a build table, or None.

    Expensive builds (the w0wacdm chi2 grids are minutes of f64 RK4/GL
    per process; `_TABLE_MEMO` is in-memory only) are pure functions of
    the memo key and the solver sources, so they are cached on disk
    next to the XLA compile cache (cosmax.utils.cache) and shared by
    the test suite, the CLIs, and bench. Set COSMAX_TABLE_CACHE=0 to
    disable, or point it at a different directory.
    """
    root = os.environ.get(
        "COSMAX_TABLE_CACHE", os.path.expanduser("~/.cache/cosmax_tables")
    )
    if root in ("", "0", "off"):
        return None
    h = hashlib.sha256()
    h.update(solver_source_hash().encode())
    h.update(kind.encode())
    h.update(repr(key).encode())
    try:
        os.makedirs(root, exist_ok=True)
    except OSError:
        return None
    return os.path.join(root, h.hexdigest() + ".npy")


def table_cached(kind, key, build):
    """Run ``build()`` through the on-disk table cache."""
    path = table_cache_path(kind, key)
    if path is not None and os.path.exists(path):
        try:
            return np.load(path)
        except Exception:
            pass  # torn/corrupt file: rebuild and overwrite
    out = build()
    if path is not None:
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path), suffix=".npy.tmp"
        )
        try:
            with os.fdopen(fd, "wb") as f:
                np.save(f, out)
            os.replace(tmp, path)  # atomic vs concurrent writers
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    return out


# ---------------------------------------------------------------------------
# rank factorisation

def svd_rank_factor(stacked, tol):
    """Truncated f64 SVD of a stacked [M, K] table at absolute
    elementwise tolerance ``tol`` -> (A [M, R], B [R, K]); B has
    orthonormal rows."""
    u, s, vt = np.linalg.svd(stacked, full_matrices=False)
    noise = s <= 2e-8 * s[0]
    rank = int(np.argmax(noise)) if noise.any() else s.size
    rank = max(rank, 1)
    while (
        rank < s.size
        and np.max(np.abs((u[:, :rank] * s[:rank]) @ vt[:rank] - stacked))
        > tol
    ):
        rank += 1
    return u[:, :rank] * s[:rank], vt[:rank]


def delta_subspace(ad_fac, b, dstacked, tol):
    """SVD the delta coefficient table into its own rd < R subspace.

    The radiation response is a small smooth perturbation, so its
    coefficients span far fewer of the R shared rank-space directions
    than the base does: keep the smallest rd whose data-space
    reconstruction still meets the contract (measured rd = 11 vs
    R = 23 on the wzcdm fs8 32^2 grid). The runtime delta coefficient
    then lives in R^rd and one [rd, R] matmul (2*rd*R flops) lifts it
    into the shared rank space — cheaper than contracting the node
    core against a full-R last axis.

    Returns (pd_fac [Mc, rd], smat [rd, R]).
    """
    du, ds, dvt = np.linalg.svd(ad_fac, full_matrices=False)
    rd = 1
    while rd < ds.size and np.max(np.abs(
        ((du[:, :rd] * ds[:rd]) @ dvt[:rd]) @ b - dstacked
    )) > tol:
        rd += 1
    return du[:, :rd] * ds[:rd], dvt[:rd]


# ---------------------------------------------------------------------------
# coefficient-table compression (Tucker / tensor train) with composed
# end-to-end verification

def composed_err(rec, proj64, ref64):
    """Max elementwise error of a reconstructed coefficient table in
    the caller's data space: |rec @ proj - ref|. Both factorisations
    verify against this — the single contract their z-SVD cut is held
    to (see :func:`tucker` for why coefficient-space checks fail)."""
    return np.max(np.abs(rec.reshape(-1, rec.shape[-1]) @ proj64 - ref64))


def tucker(table, node_shape, tol, proj, ref):
    """HOSVD-compress ``table`` [*node_shape, R] along the parameter axes.

    The barycentric evaluation contracts weight vectors against the FULL
    node grid, so its per-eval cost is O(prod(node_shape) * R) — 32^2*R
    for wzcdm and 2 x 40^3 * R for the split-axis w0wacdm build, which
    dominates the whole multiprobe joint (XLA cost analysis, round 3).
    But the same spectral smoothness that makes Chebyshev interpolation
    converge makes the table's mode-i unfoldings low-rank: a build-time
    f64 HOSVD factors it as table ~= core x_i U_i with per-axis ranks
    r_i ~ 10-15 << n_i, so evaluation becomes k tiny [n_i, r_i] weight
    projections plus an O(prod(r_i) * R) core contraction — an order of
    magnitude fewer flops and HBM bytes at identical accuracy.

    Rank selection mirrors :func:`svd_rank_factor`: start each axis at
    its unfolding's spectral noise floor, then grow ranks (largest tail
    first) until the COMPOSED approximation — Tucker reconstruction
    expanded through the caller's z basis ``proj`` [R, N] — matches
    the caller's ORIGINAL data-space table ``ref`` [M, N] elementwise
    to the single ``tol`` its z-SVD truncation is held to. Verifying
    the composition end-to-end (rather than Tucker-vs-coefficients
    with a split budget) matters twice over: the rank-R coefficient
    table concentrates the table's own incompressible RK4/GL noise
    (measured 4.5e-5 absolute vs tol 2.3e-5 on the whitened wzcdm
    chi2 coefficients — unreachable elementwise), and near the noise
    floor each 2x tolerance split inflates ranks ~2x (measured
    (12,13) -> (22,22)) chasing noise the z basis averages away.
    Returns ``(None, table_j)`` when compression wouldn't pay.
    """
    k = len(node_shape)
    tab64 = np.asarray(table, np.float64)
    proj64 = np.asarray(proj, np.float64)
    ref64 = np.asarray(ref, np.float64)

    svds = []
    for ax in range(k):
        mat = np.moveaxis(tab64, ax, 0).reshape(node_shape[ax], -1)
        u, s, _ = np.linalg.svd(mat, full_matrices=False)
        # mode-unfolding spectra decay spectrally to the table's own
        # RK4/GL noise flatline at ~8e-8 RELATIVE (measured, wzcdm
        # chi2 table) — above the 2e-8 criterion the z-SVD uses — so
        # start at 1e-7 and let the elementwise loop below grow ranks
        # if that undershoots.
        noise = s <= 1e-7 * s[0]
        r = int(np.argmax(noise)) if noise.any() else s.size
        svds.append((u, s, max(r, 1)))

    def reconstruct(ranks):
        core = tab64
        for ax in range(k):
            u = svds[ax][0][:, : ranks[ax]]
            core = np.moveaxis(
                np.tensordot(u.T, np.moveaxis(core, ax, 0), axes=1), 0, ax
            )
        rec = core
        for ax in range(k):
            u = svds[ax][0][:, : ranks[ax]]
            rec = np.moveaxis(
                np.tensordot(u, np.moveaxis(rec, ax, 0), axes=1), 0, ax
            )
        return core, rec

    ranks = [r for _, _, r in svds]
    while True:
        core, rec = reconstruct(ranks)
        if composed_err(rec, proj64, ref64) <= tol:
            break
        growable = [ax for ax in range(k) if ranks[ax] < node_shape[ax]]
        if not growable:
            break
        # grow the axis with the largest discarded singular value
        ax = max(growable, key=lambda a: svds[a][1][ranks[a]]
                 if ranks[a] < svds[a][1].size else -np.inf)
        ranks[ax] += 1

    if np.prod(ranks) * 2 > np.prod(node_shape):
        return None, jnp.asarray(table)
    factors = [jnp.asarray(svds[ax][0][:, : ranks[ax]]) for ax in range(k)]
    return factors, jnp.asarray(core)


def tt(table, node_shape, tol, proj, ref):
    """TT-SVD (tensor train) of ``table`` [*node_shape, R] along the
    parameter axes, for grids with >= 3 of them.

    Tucker evaluation must touch every core entry once, so its cost is
    2 * prod(r_i) * R — for the w0wacdm split-axis build that is still
    ~200k flops per half even at ranks ~15 (measured 773k flops/eval
    total). A tensor train never materialises the full core: evaluation
    sweeps v <- v @ (w_i . G_i) through [r_{i-1}, n_i, r_i] cores, so
    the cost is sum 2 * n * r_{i-1} * r_i — linear in the number of
    axes instead of exponential. (For k <= 2 the sweep degenerates to
    cost 2*n*r1*r2 > Tucker's 2*r1*r2*R whenever R < n, so Tucker
    stays the 2-D representation.)

    Bond ranks are ranks of SEQUENTIAL unfoldings, so the axis ORDER
    matters a great deal (measured on the phantom-side w0wacdm half:
    middle bond 87 in (Om, wa, s) order). The order is chosen first by
    a cheap estimate — singular-value-only SVDs of every single-axis
    and axis-pair unfolding give each permutation's bond ranks without
    building anything — then the best order is built in two stages,
    both under the composed-verification contract of :func:`tucker`
    (reconstruction expanded through the caller's z basis ``proj`` vs
    the caller's original data-space table ``ref``, absolute ``tol``):
    (1) a global relative truncation eps halved from the spectral
    noise floor until feasible; (2) a per-bond binary search that
    shrinks each bond to the smallest rank that still verifies.
    Returns None if tol is unreachable or compression wouldn't pay.
    """
    k = len(node_shape)
    tab0 = np.asarray(table, np.float64)
    nz = tab0.shape[-1]
    proj64 = np.asarray(proj, np.float64)
    ref64 = np.asarray(ref, np.float64)

    def est_rank(axes_front):
        mat = np.transpose(
            tab0,
            tuple(axes_front)
            + tuple(a for a in range(k) if a not in axes_front)
            + (k,),
        ).reshape(int(np.prod([node_shape[a] for a in axes_front])), -1)
        s = np.linalg.svd(mat, compute_uv=False)
        return max(int(np.sum(s > 1e-7 * s[0])), 1)

    singles = {(a,): est_rank((a,)) for a in range(k)}
    pairs = {}
    best_perm, best_cost = None, np.inf
    for perm in permutations(range(k)):
        bonds = []
        for cut in range(1, k):
            front = tuple(sorted(perm[:cut]))
            if len(front) == 1:
                bonds.append(singles[front])
            else:
                if front not in pairs:
                    pairs[front] = est_rank(front)
                bonds.append(pairs[front])
        n = [node_shape[a] for a in perm]
        r_last = min(bonds[-1] * n[-1], nz)  # final bond into the tail
        cost = 2 * n[0] * bonds[0] + 2 * r_last * nz
        for i in range(1, k):
            r_in = bonds[i - 1]
            r_out = bonds[i] if i < k - 1 else r_last
            cost += 2 * n[i] * r_in * r_out
        if cost < best_cost:
            best_perm, best_cost = perm, cost

    perm = best_perm
    tab64 = np.ascontiguousarray(np.transpose(tab0, perm + (k,)))
    shape_p = [node_shape[a] for a in perm]

    def build(eps, caps):
        cores = []
        carry = tab64.reshape(shape_p[0], -1)
        r_prev = 1
        for i in range(k):
            mat = carry if i == 0 else carry.reshape(r_prev * shape_p[i], -1)
            u, s, vt = np.linalg.svd(mat, full_matrices=False)
            r = max(int(np.sum(s > eps * s[0])), 1)
            if caps is not None:
                r = min(r, caps[i])
            if i == 0:
                cores.append(u[:, :r])  # [n1, r1]
            else:
                cores.append(u[:, :r].reshape(r_prev, shape_p[i], r))
            carry = s[:r, None] * vt[:r]
            r_prev = r
        return cores, carry.reshape(r_prev, nz)

    inv_perm = tuple(np.argsort(perm))

    def passes(cores, tail):
        rec = cores[0]
        for g in cores[1:]:
            rec = np.tensordot(rec, g, axes=(rec.ndim - 1, 0))
        rec = np.tensordot(rec, tail, axes=(rec.ndim - 1, 0))
        rec = np.transpose(rec, inv_perm + (k,))
        return composed_err(rec, proj64, ref64) <= tol

    eps = 1e-7
    for _ in range(12):
        cores, tail = build(eps, None)
        if passes(cores, tail):
            break
        eps *= 0.5
    else:
        return None

    ranks = [c.shape[-1] for c in cores]
    for i in range(k):
        lo, hi = 1, ranks[i]
        while lo < hi:
            mid = (lo + hi) // 2
            trial = list(ranks)
            trial[i] = mid
            if passes(*build(eps, trial)):
                hi = mid
            else:
                lo = mid + 1
        ranks[i] = lo
    cores, tail = build(eps, ranks)
    if not passes(cores, tail):  # defensive: keep the verified UB build
        cores, tail = build(eps, None)

    n_stored = sum(c.size for c in cores) + tail.size
    if n_stored * 2 > tab64.size:
        return None
    return perm, [jnp.asarray(c) for c in cores], jnp.asarray(tail)


def seq_contract_flops(shape):
    """Flops of sequentially contracting leading axes off ``shape``."""
    return sum(2 * int(np.prod(shape[i:])) for i in range(len(shape) - 1))


def eval_flops(rep):
    """Exact per-eval flop count of :func:`coeff_contract` on a tagged
    rep."""
    if rep[0] == "exact":
        return seq_contract_flops(rep[1].shape)
    if rep[0] == "tucker":
        _, factors, core = rep
        return sum(
            2 * u.shape[0] * u.shape[1] for u in factors
        ) + seq_contract_flops(core.shape)
    _, _, cores, tail = rep  # tt
    total = 2 * cores[0].shape[0] * cores[0].shape[1]
    for g in cores[1:]:
        r_prev, n, r = g.shape
        total += 2 * n * r_prev * r + 2 * r_prev * r
    return total + 2 * tail.shape[0] * tail.shape[1]


def compress(table, node_shape, tol, proj, ref):
    """Pick the cheapest verified representation of the coefficient
    table by exact eval flop count: TT (>= 3 parameter axes only) vs
    Tucker HOSVD, exact-table fallback when neither verifies cheaply.
    Returns a tagged rep consumed by :func:`coeff_contract`."""
    candidates = []
    if len(node_shape) >= 3:
        rep_tt = tt(table, node_shape, tol, proj, ref)
        if rep_tt is not None:
            candidates.append(("tt",) + rep_tt)
    factors, core = tucker(table, node_shape, tol, proj, ref)
    if factors is None:
        candidates.append(("exact", core))
    else:
        candidates.append(("tucker", factors, core))
    return min(candidates, key=eval_flops)


def coeff_contract(weights, rep):
    """Contract barycentric weight vectors against a tagged coefficient
    representation -> the rank-space (or raw) coefficient vector."""
    hi = jax.lax.Precision.HIGHEST
    kind = rep[0]
    if kind == "exact":
        out = rep[1]
        for w in weights:
            out = jnp.tensordot(w, out, axes=(0, 0), precision=hi)
        return out
    if kind == "tucker":
        _, factors, core = rep
        out = core
        for w, u in zip(weights, factors):
            wp = jnp.tensordot(u, w, axes=(0, 0), precision=hi)
            out = jnp.tensordot(wp, out, axes=(0, 0), precision=hi)
        return out
    _, perm, cores, tail = rep  # tt, axes in build order
    wp = [weights[a] for a in perm]
    v = jnp.tensordot(wp[0], cores[0], axes=(0, 0), precision=hi)
    for w, g in zip(wp[1:], cores[1:]):
        m = jnp.tensordot(w, g, axes=(0, 1), precision=hi)  # [r_prev, r]
        v = jnp.tensordot(v, m, axes=(0, 0), precision=hi)
    return jnp.tensordot(v, tail, axes=(0, 0), precision=hi)
