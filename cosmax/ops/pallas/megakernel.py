"""Pallas TPU mega-kernel: a whole joint log-probability per walker
block, VMEM-resident.

Why: the flagship fast path is ~8k flops/eval of transcendental-heavy
VPU arithmetic (bench.py cost analysis). XLA's fusion already beats the
logical-byte roofline (ARCHITECTURE.md "Roofline"), but every
reduction/cumsum/small-matmul is still a fusion boundary that can
materialise a ``[W, nodes]`` intermediate in HBM. This wrapper runs the
*entire* vmapped log-probability for a block of walkers inside one
``pallas_call``: the only HBM traffic is the ``[block, D]`` walker tile
in and the ``[block]`` log-prob tile out — everything between lives in
VMEM.

The kernel body is the ordinary jnp log-probability traced by Mosaic,
so it needs no per-likelihood reimplementation; whether it compiles is
up to Mosaic's op coverage (gathers/cumsums over tiny static axes).
``blocked_log_prob(..., interpret=True)`` runs the same blocking in
interpreter mode for correctness tests on CPU. Measured results live in
ARCHITECTURE.md — like the chi² kernel (ops/pallas/chi2.py), this is
retained infrastructure whether or not it beats XLA on a given round's
compiler.
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_rewrite(params, lhs, rhs):
    """Canonicalise a ``dot_general`` for Mosaic, whose TPU dot lowering
    accepts only plain 2-D matmuls (rank-1 operands and batch dims hit
    an MLIR attribute parse error as of jax 0.9). Rank-2 pairs become
    ``lhs' @ rhs'`` via transposes; rank-1/batched dots become an
    explicit broadcast-multiply-reduce (exact f32 on the VPU, fine at
    the tiny K<=65 contractions cosmax likelihoods produce)."""
    (lc, rc), (lb, rb) = params["dimension_numbers"]
    # len(lc) == 1: a two-axis contraction (e.g. a Frobenius inner
    # product) must take the general multiply-reduce path below — the
    # transpose logic here assumes exactly one contracting dim
    if not lb and not rb and lhs.ndim == 2 and rhs.ndim == 2 and len(lc) == 1:
        lt = lhs if lc == (1,) else lhs.T
        rt = rhs if rc == (0,) else rhs.T
        return lax.dot_general(
            lt,
            rt,
            (((1,), (0,)), ((), ())),
            precision=params.get("precision"),
            preferred_element_type=params.get("preferred_element_type"),
        )
    lf = [d for d in range(lhs.ndim) if d not in lc and d not in lb]
    rf = [d for d in range(rhs.ndim) if d not in rc and d not in rb]
    # dot_general output layout: batch dims, lhs free dims, rhs free dims
    lt = jnp.transpose(lhs, list(lb) + lf + list(lc))
    rt = jnp.transpose(rhs, list(rb) + rf + list(rc))
    for _ in rf:  # broadcast lhs over rhs free dims
        lt = jnp.expand_dims(lt, axis=len(lb) + len(lf))
    for _ in lf:  # broadcast rhs over lhs free dims
        rt = jnp.expand_dims(rt, axis=len(rb))
    out = lt * rt
    if lc:
        out = jnp.sum(out, axis=tuple(range(-len(lc), 0)))
    pet = params.get("preferred_element_type")
    return out.astype(pet) if pet is not None else out


def _eval_rewritten(jaxpr, consts, *args):
    """``jax.core.eval_jaxpr`` with the dot_general rewrite applied,
    recursing through inlined pjit calls."""
    from jax.extend import core as jcore

    env = {}

    def read(v):
        return v.val if isinstance(v, jcore.Literal) else env[v]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        prim = eqn.primitive
        if prim.name == "pjit":
            inner = eqn.params["jaxpr"]
            outvals = _eval_rewritten(inner.jaxpr, inner.consts, *invals)
        elif prim.name == "dot_general":
            outvals = [_dot_rewrite(eqn.params, *invals)]
        else:
            subfuns, bind_params = prim.get_bind_params(eqn.params)
            ans = prim.bind(*subfuns, *invals, **bind_params)
            outvals = ans if prim.multiple_results else [ans]
        for v, o in zip(eqn.outvars, outvals):
            env[v] = o
    return [read(v) for v in jaxpr.outvars]


def blocked_log_prob(
    log_prob_fn,
    ndim: int,
    block: int = 2048,
    interpret: bool = False,
):
    """Batched evaluator ``walkers[W, ndim] -> logp[W]`` with the whole
    per-block computation fused into one Pallas kernel.

    ``log_prob_fn`` is the scalar ``theta[ndim] -> logp`` function the
    samplers consume (``make_log_prob`` output). Returns a function
    with the same contract as ``jax.vmap(log_prob_fn)``.
    """
    vbody = jax.vmap(log_prob_fn)
    # Pallas kernels may not capture array constants (quadrature nodes,
    # Gram matrices, data vectors...) — trace the body to a jaxpr and
    # hoist its constvars into explicit kernel inputs, each kept whole
    # in VMEM and shared by every grid step. All cosmax likelihood
    # constants are small (<= [33, 33]); the big covariances were
    # folded away at build time by the compressed basis.
    example = jnp.zeros((block, ndim), jnp.float32)
    # Mosaic has no cumsum/gather lowering — trace the prefix sums on
    # the distance ladder as triangular-ones matmuls instead
    # (ops/quadrature.py matmul_prefix_sums; bit-identical is not
    # expected, agreement is to f32 roundoff).
    from cosmax.ops.quadrature import matmul_prefix_sums

    with matmul_prefix_sums():
        closed = jax.make_jaxpr(vbody)(example)
    consts = [jnp.asarray(c) for c in closed.consts]
    # Mosaic-friendly transport: scalars ride as [1] arrays, bool masks
    # as int32; restored to the exact constvar avals inside the kernel.
    is_scalar = [c.ndim == 0 for c in consts]
    dtypes = [c.dtype for c in consts]
    consts_in = [
        (c.reshape(1) if c.ndim == 0 else c).astype(
            jnp.int32 if c.dtype == jnp.bool_ else c.dtype
        )
        for c in consts
    ]

    def kernel(*refs):
        w_ref, *const_refs, out_ref = refs
        i = pl.program_id(0)
        vals = []
        for r, scalar, dt in zip(const_refs, is_scalar, dtypes):
            v = r[:]
            if dt == jnp.bool_:
                v = v != 0
            vals.append(v[0] if scalar else v)
        (res,) = _eval_rewritten(closed.jaxpr, vals, w_ref[:])
        out_ref[i, :] = res.astype(jnp.float32)

    def _const_spec(c):
        return pl.BlockSpec(
            c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM
        )

    def batched(walkers):
        walkers = jnp.asarray(walkers)
        w, d = walkers.shape
        if d != ndim:
            raise ValueError(f"walkers have dim {d}, expected {ndim}")
        pad = (-w) % block
        wp = jnp.pad(walkers, ((0, pad), (0, 0)))
        n_blocks = wp.shape[0] // block
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(
                    (block, d), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
            ] + [_const_spec(c) for c in consts_in],
            # [n_blocks, block] output resident in VMEM, rows indexed by
            # program_id — 1-D narrow outputs hit Mosaic layout
            # restrictions (same pattern as ops/pallas/chi2.py)
            out_specs=pl.BlockSpec(
                (n_blocks, block), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_blocks, block), jnp.float32),
            interpret=interpret,
        )(wp.astype(jnp.float32), *consts_in)
        return out.reshape(-1)[:w]

    return batched
