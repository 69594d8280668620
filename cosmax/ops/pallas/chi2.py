"""Pallas TPU kernel: fused whitened-residual chi^2.

chi2[w] = || Linv @ delta[w] ||^2 for a walker batch of residuals —
the hot op of every dense Gaussian likelihood (sn/pantheon.py:38-40 at
reference scale; here one kernel for a whole [W, N] batch).

Why a kernel: XLA computes this as matmul([W,N],[N,N]) -> [W,N] in HBM
followed by a square-reduce — for the 1e5-walker north-star config
(BASELINE.md) the whitened intermediate is W x N x 4B ~ 0.7 GB of HBM
traffic per probe per step. The Pallas kernel tiles over (W, N-columns)
with the column-block accumulation kept in VMEM, so the intermediate
never touches HBM: per grid step it streams one [BW, N] delta block and
one [BN, N] Linv block and accumulates partial squares into the [BW]
output.

Grid: (W/BW, N/BN) with the N-column loop innermost; the accumulator
uses the output ref (revisited across the inner dimension, standard
Pallas reduction pattern). MXU does the [BW, N] x [N, BN] contraction.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chi2_kernel(delta_ref, linv_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # [BW, N] x [N, BN] on the MXU. precision=HIGHEST is load-bearing:
    # preferred_element_type=f32 alone still multiplies in single-pass
    # bf16 inside Mosaic (measured 6.2e-4 rel error vs 1.5e-7 with the
    # 6-pass HIGHEST lowering — see ARCHITECTURE.md "Native code").
    wht = jax.lax.dot_general(
        delta_ref[:], linv_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    partial = jnp.sum(wht * wht, axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[i, :] = partial

    @pl.when(j != 0)
    def _():
        out_ref[i, :] = out_ref[i, :] + partial


def whitened_chi2_pallas(
    linv,
    delta,
    block_w: int = 256,
    block_n: int = 256,
    interpret: bool = False,
):
    """chi2 = ||Linv delta||^2 over the walker batch.

    linv: [N, N] (static constant); delta: [W, N] -> [W] chi^2.
    Pads W and N up to the block sizes (Linv rows are zero-padded, so
    padding contributes nothing).
    """
    w, n = delta.shape
    pad_w = (-w) % block_w
    pad_n = (-n) % block_n
    if pad_n:
        linv = jnp.pad(linv, ((0, pad_n), (0, pad_n)))
        delta = jnp.pad(delta, ((0, 0), (0, pad_n)))
    if pad_w:
        delta = jnp.pad(delta, ((0, pad_w), (0, 0)))
    wp, np_ = delta.shape

    grid = (wp // block_w, np_ // block_n)
    out = pl.pallas_call(
        _chi2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_w, np_), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_n, np_), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        # The [n_blocks, block_w] result is tiny; keep the whole array
        # resident in VMEM across the grid and index rows by program_id
        # (1-D / narrow outputs hit Mosaic layout restrictions).
        out_specs=pl.BlockSpec(
            (wp // block_w, block_w), lambda i, j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((wp // block_w, block_w), jnp.float32),
        interpret=interpret,
    )(delta.astype(jnp.float32), linv.astype(jnp.float32))
    return out.reshape(wp)[:w]
