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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    from jax import core as jcore

    vbody = jax.vmap(log_prob_fn)
    # Pallas kernels may not capture array constants (quadrature nodes,
    # Gram matrices, data vectors...) — trace the body to a jaxpr and
    # hoist its constvars into explicit kernel inputs, each kept whole
    # in VMEM and shared by every grid step. All cosmax likelihood
    # constants are small (<= [33, 33]); the big covariances were
    # folded away at build time by the compressed basis.
    example = jnp.zeros((block, ndim), jnp.float32)
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
        (res,) = jcore.eval_jaxpr(closed.jaxpr, vals, w_ref[:])
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
