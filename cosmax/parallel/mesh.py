"""Multi-chip scaling over a ``jax.sharding.Mesh``.

The reference's only parallelism is pickling walkers to 5-10 worker
processes (sn/pantheon.py:77, SURVEY.md SS2.5). Here the two scaling
axes of the workload map onto a 2-D device mesh:

* ``'w'`` (walkers, data-parallel): the ensemble's walker axis is
  sharded across devices; the sampler's lockstep update is SPMD, and
  the only cross-device traffic is the complementary-half gather of
  the red-black update, which XLA lowers to an all-gather on ICI.
* ``'d'`` (data, "sequence"-parallel): the large SN covariance
  whitener (up to 1829^2, sn/pantheon.py:18) is sharded by rows; each
  device computes a partial whitened residual block and the chi^2
  reduction is a psum. This bounds per-device memory for the 1e5-walker
  north-star config (BASELINE.md) where the [W, N] whitened
  intermediate would otherwise be ~GBs.

Two styles are provided: sharding-annotation (GSPMD propagates through
the existing jitted sampler unchanged) and an explicit ``shard_map``
chi^2 for the data axis.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(walkers: int = None, data: int = 1, devices=None) -> Mesh:
    """Mesh with axes ('w', 'd'). Defaults to all devices on 'w'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if walkers is None:
        walkers = devices.size // data
    if walkers * data != devices.size:
        raise ValueError(
            f"mesh {walkers}x{data} != {devices.size} devices available"
        )
    return Mesh(devices.reshape(walkers, data), axis_names=("w", "d"))


def make_multislice_mesh(
    n_slices: int, walkers: int = None, data: int = 1, devices=None
) -> Mesh:
    """('s', 'w', 'd') mesh for multi-pod-slice runs (DCN between
    slices, ICI within).

    The workload's communication profile makes the slice split cheap:
    the walker axis is sharded over ('s', 'w') and the only cross-slice
    traffic per MCMC step is the red-black complementary-half gather of
    the [W/2, D] walker block — D ~ 10 parameters, i.e. kilobytes —
    which DCN absorbs easily. The bandwidth-hungry axis, the
    data-parallel chi^2 psum over covariance rows ('d'), is laid out
    innermost so it stays on ICI within a slice. Device order must list
    each slice's chips contiguously (as jax.devices() does on
    multi-slice deployments).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if walkers is None:
        walkers = devices.size // (n_slices * data)
    if n_slices * walkers * data != devices.size:
        raise ValueError(
            f"mesh {n_slices}x{walkers}x{data} != {devices.size} devices"
        )
    return Mesh(
        devices.reshape(n_slices, walkers, data), axis_names=("s", "w", "d")
    )


def _walker_axes(mesh: Mesh) -> tuple:
    """Mesh axes the walker dimension is sharded over — every axis
    except the data axis 'd' (('w',) or ('s', 'w'))."""
    return tuple(n for n in mesh.axis_names if n != "d")


def walker_sharding(mesh: Mesh) -> NamedSharding:
    """[W, D] walker arrays sharded along the walker axis."""
    return NamedSharding(mesh, P(_walker_axes(mesh), None))


def shard_walkers(mesh: Mesh, walkers):
    return jax.device_put(walkers, walker_sharding(mesh))


def sharded_batched_log_prob(log_prob_fn, mesh: Mesh):
    """Batched log-prob with the walker axis sharded via shard_map:
    each device vmaps the scalar log-prob over its local walker block.
    Plug into ``EnsembleSampler(vmapped_log_prob=...)``.
    """
    local = jax.vmap(log_prob_fn)
    all_axes = _walker_axes(mesh) + (("d",) if "d" in mesh.axis_names else ())

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(all_axes, None),
        out_specs=P(all_axes),
    )
    def batched(walkers):
        return local(walkers)

    return batched


def data_sharded_chi2(linv, mesh: Mesh):
    """chi^2(delta) = ||Linv delta||^2 with Linv's rows sharded over the
    'd' mesh axis: per-device partial matmul + psum — an explicit
    shard_map pipeline for the large-covariance SN solves.

    delta: [..., N] (walker axes replicated or sharded over 'w');
    returns [...] chi^2.
    """
    n = linv.shape[0]
    pad = (-n) % mesh.shape["d"]
    if pad:
        linv = np.pad(np.asarray(linv), ((0, pad), (0, 0)))
    linv_dev = jax.device_put(
        jnp.asarray(linv), NamedSharding(mesh, P("d", None))
    )
    w_axes = _walker_axes(mesh)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("d", None), P(w_axes, None)),
        out_specs=P(w_axes),
    )
    def chi2_shards(linv_block, delta):
        from cosmax.ops.linalg import pdot

        wht = pdot(delta, linv_block.T)  # [w_local, N] @ [N, n_local]
        partial_chi2 = jnp.sum(wht * wht, axis=-1)
        return jax.lax.psum(partial_chi2, axis_name="d")

    def chi2(delta):
        return chi2_shards(linv_dev, delta)

    return chi2
