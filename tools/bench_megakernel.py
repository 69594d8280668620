"""Measure the VMEM mega-kernel (ops/pallas/megakernel.py) against the
plain XLA-fused vmap path on the real TPU, on the flagship joint.

Prints one line per path: walltime/eval and evals/s, plus whether the
Mosaic compile succeeded. Run on the TPU (axon default platform):

    python tools/bench_megakernel.py [--walkers 262144] [--block 2048]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers", type=int, default=262144)
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cosmax.configs import get_preset
    from cosmax.utils import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices())

    fit = get_preset("bao.desi_cmb_des5y", model="wzcdm", fast=True)
    lp = fit.log_prob()
    dim = fit.spec.dim
    mid = 0.5 * (fit.spec.bounds[:, 0] + fit.spec.bounds[:, 1])
    span = 0.05 * (fit.spec.bounds[:, 1] - fit.spec.bounds[:, 0])
    rng = np.random.default_rng(0)
    walkers = jax.device_put(
        jnp.asarray(
            (mid + span * rng.standard_normal((args.walkers, dim))).astype(
                np.float32
            )
        )
    )

    def bench(name, fn):
        t0 = time.time()
        out = fn(walkers)
        ref = np.asarray(out)  # force host fetch (axon block_until_ready trap)
        print(f"{name}: compile+first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(walkers)
        np.asarray(out)
        dt = (time.time() - t0) / args.reps
        print(
            f"{name}: {dt * 1e3:.2f} ms/call, "
            f"{args.walkers / dt / 1e6:.1f}M evals/s"
        )
        return ref

    ref = bench("xla_vmap", jax.jit(jax.vmap(lp)))

    from cosmax.ops.pallas.megakernel import blocked_log_prob

    try:
        mk = jax.jit(blocked_log_prob(lp, dim, block=args.block))
        got = bench(f"megakernel(block={args.block})", mk)
        finite = np.isfinite(ref)
        err = np.max(
            np.abs(got[finite] - ref[finite]) / np.maximum(1.0, np.abs(ref[finite]))
        )
        print(f"megakernel max rel err vs vmap (finite rows): {err:.2e}")
    except Exception as e:  # Mosaic op-coverage failures surface here
        print(f"megakernel FAILED: {type(e).__name__}: {str(e)[:3000]}")


if __name__ == "__main__":
    main()
