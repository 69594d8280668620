"""CLI driver — one composable entry point replacing the reference's
~40 ``python3 -m <pkg>.<script>`` analysis modules (README.md:9-17).

Examples::

    python -m cosmax.fit --preset bao.desi --model lcdm
    python -m cosmax.fit --preset bao.desi_cmb_des5y --model w0wacdm \
        --steps 2200 --walkers 150 --seed 42 --out results/flagship
    python -m cosmax.fit --list

Outputs the reference-style summary block to stdout and, with --out,
a summary.json plus corner/trace PNGs.
"""

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="cosmax.fit", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("--preset", help="preset name, e.g. bao.desi")
    p.add_argument("--model", default="wzcdm",
                   choices=["lcdm", "wcdm", "wzcdm", "w0wacdm"])
    p.add_argument("--steps", type=int, default=None,
                   help="override preset n_steps (incl. burn-in)")
    p.add_argument("--walkers", type=int, default=None)
    p.add_argument("--burn-in", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--thin", type=int, default=1)
    p.add_argument("--moves", default=None,
                   choices=[None, "reference", "stretch"],
                   help="override move mixture")
    p.add_argument("--sampler", default="ensemble",
                   choices=["ensemble", "hmc"],
                   help="ensemble (reference-equivalent, gradient-free) "
                        "or hmc (gradient-based, adaptive; needs no "
                        "burn-in — warmup is separate and discarded)")
    p.add_argument("--warmup", type=int, default=None,
                   help="hmc only: adaptation steps (default: the "
                        "preset's burn-in)")
    p.add_argument("--max-leapfrog", type=int, default=32,
                   help="hmc only: max leapfrog steps per trajectory")
    p.add_argument("--out", default=None, help="output directory")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file; resumes if present")
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--fast", action="store_true",
                   help="production TPU path: GL distances + compressed "
                        "SN basis (default: reference-matched parity grids)")
    p.add_argument("--x64", action="store_true",
                   help="float64 parity mode (slow on TPU)")
    p.add_argument("--synthetic-sys", action="store_true",
                   help="add the deterministic synthetic systematic "
                        "covariance to SN datasets whose published one "
                        "is stripped from the checkout (full-scale dense "
                        "structure; chi^2 NOT comparable to published)")
    p.add_argument("--list", action="store_true", help="list presets")
    args = p.parse_args(argv)

    if args.list:
        # Print from the static index without building any preset
        # (building loads every dataset and quadrature — minutes in
        # total; the index is guarded against drift by
        # tests/test_presets.py::test_index_matches_registry).
        from cosmax._preset_index import PRESET_NOTES

        for name in sorted(PRESET_NOTES):
            print(f"{name:28s} {PRESET_NOTES[name]}")
        return 0

    if not args.preset:
        p.error("--preset is required (or --list)")

    from cosmax.configs import get_preset

    if args.x64:
        import cosmax

        cosmax.enable_x64()

    import numpy as np
    import jax

    from cosmax.utils.cache import enable_compile_cache

    enable_compile_cache()

    from cosmax.samplers import EnsembleSampler
    from cosmax.samplers.ensemble import uniform_init, stretch_only, default_moves
    from cosmax.report import summarize, format_summary, plots

    fit = get_preset(args.preset, args.model, fast=args.fast,
                     synthetic_sys=args.synthetic_sys)
    n_walkers = args.walkers if args.walkers is not None else fit.n_walkers
    n_steps = args.steps if args.steps is not None else fit.n_steps
    burn_in = args.burn_in if args.burn_in is not None else fit.burn_in
    if burn_in >= n_steps and args.burn_in is None:
        # a --steps override below the preset's burn-in would retain
        # zero samples; scale the preset burn down instead of crashing
        # in the quantile reduction (keep an explicit --burn-in as
        # given — then the empty-chain error below is the user's ask)
        burn_in = n_steps // 2
        print(f"# --steps {n_steps} <= preset burn-in {fit.burn_in}: "
              f"clamping burn-in to {burn_in}")
    if burn_in >= n_steps:
        p.error(f"--burn-in {burn_in} must be < steps ({n_steps}): "
                "no samples would remain")
    if n_walkers < 4:
        p.error(f"--walkers must be >= 4 (got {n_walkers})")
    if n_steps < 1:
        p.error(f"--steps must be >= 1 (got {n_steps})")
    if args.thin < 1:
        p.error(f"--thin must be >= 1 (got {args.thin})")
    if args.checkpoint_every < 1:
        p.error(f"--checkpoint-every must be >= 1 (got {args.checkpoint_every})")
    seed = args.seed if args.seed is not None else (fit.seed or 0)
    moves = (
        stretch_only() if args.moves == "stretch"
        else default_moves() if args.moves == "reference"
        else fit.moves
    )
    if n_walkers % 2:
        n_walkers += 1

    print(f"# {fit.name} [{fit.model}]  {fit.note}")
    print(f"# params: {', '.join(fit.spec.names)}")

    if args.sampler == "hmc":
        from cosmax.samplers.hmc import HMCSampler

        warmup = args.warmup if args.warmup is not None else burn_in
        n_record = max(1, n_steps - burn_in)
        print(f"# hmc: {n_walkers} chains x {n_record} samples "
              f"(warmup {warmup}), seed {seed}, devices: {jax.devices()}")
        sampler = HMCSampler(
            fit.log_prob(), fit.spec.bounds, n_walkers,
            max_leapfrog=args.max_leapfrog,
        )
        key_init, key_run = jax.random.split(jax.random.PRNGKey(seed))
        try:
            # MAP + Laplace-sigma jitter: robust for the posteriors
            # that occupy ~1e-4 of the box (see map_jitter_init)
            from cosmax.samplers.optimize import map_jitter_init

            initial = map_jitter_init(fit, key_init, n_walkers)
        except Exception as e:
            print(f"# map init failed ({e}); falling back to uniform")
            initial = uniform_init(key_init, fit.spec.bounds, n_walkers)
        t0 = time.time()
        start_step = 0
        if args.checkpoint:
            from cosmax.samplers.checkpoints import run_hmc_with_checkpoints

            state, chain, start_step = run_hmc_with_checkpoints(
                sampler, key_run, n_record, args.checkpoint,
                every=args.checkpoint_every, n_warmup=warmup,
                initial=initial,
            )
            if chain is None:
                print("# checkpoint already covers the requested steps; "
                      "nothing to do")
                return 0
            if start_step:
                print(f"# resumed from recorded draw {start_step}; chain "
                      f"holds the post-resume segments only")
        else:
            state, chain = sampler.run(
                key_run, n_record, n_warmup=warmup, initial=initial
            )
        np.asarray(chain.samples[-1, :1])
        dt = time.time() - t0
        div_per_chain = np.asarray(chain.divergences_per_chain)
        n_div = int(div_per_chain.sum())
        print(f"# sampled {n_record - start_step} post-warmup steps in {dt:.1f}s "
              f"(step size {np.max(sampler.step_size):.4g}, "
              f"divergent trajectories {n_div} across "
              f"{int((div_per_chain > 0).sum())} chains)")
        if sampler.warmup_retries:
            print(f"# WARNING: warmup needed {sampler.warmup_retries} "
                  f"retr{'y' if sampler.warmup_retries == 1 else 'ies'} "
                  f"(ensemble escaped during adaptation); inspect "
                  f"split R-hat before trusting the run")
        from cosmax.samplers.diagnostics import split_gelman_rubin

        discard = 0
        summary = summarize(fit, chain, discard=0)
        summary["walltime_sec"] = dt
        summary["sampler"] = {
            "kind": "hmc",
            "step_size": np.asarray(sampler.step_size).tolist(),
            "inv_mass": sampler.inv_mass.tolist(),
            "divergent_trajectories": n_div,
            "divergences_per_chain": div_per_chain.tolist(),
            "split_gelman_rubin": split_gelman_rubin(
                np.asarray(chain.samples)
            ).tolist(),
            "rejuvenated_chains": sampler.n_rejuvenated,
            "warmup_retries": sampler.warmup_retries,
        }
        print(format_summary(summary))
        _write_outputs(args, fit, chain, summary, discard)
        return 0

    print(f"# {n_walkers} walkers x {n_steps} steps (burn-in {burn_in}), "
          f"seed {seed}, devices: {jax.devices()}")

    sampler = EnsembleSampler(
        fit.log_prob(), n_walkers, fit.spec.dim, moves=moves
    )
    key_init, key_run = jax.random.split(jax.random.PRNGKey(seed))
    initial = uniform_init(key_init, fit.spec.bounds, n_walkers)

    t0 = time.time()
    start_step = 0
    if args.checkpoint:
        from cosmax.samplers.checkpoints import run_with_checkpoints

        state, chain, start_step = run_with_checkpoints(
            sampler, key_run, initial, n_steps, args.checkpoint,
            every=args.checkpoint_every, thin=args.thin,
        )
        if chain is None:
            print("# checkpoint already covers the requested steps; nothing to do")
            return 0
        if start_step:
            print(f"# resumed from step {start_step}; chain holds the "
                  f"post-resume segments only")
    else:
        state, chain = sampler.run(key_run, initial, n_steps, thin=args.thin)
    # force a host fetch — the axon tunnel's block_until_ready is async
    np.asarray(chain.samples[-1, :1])
    dt = time.time() - t0
    evals = (n_steps - start_step) * n_walkers
    print(f"# sampled {evals} log-prob evals in {dt:.1f}s "
          f"({evals / dt:.0f} evals/s incl. compile)")

    # burn-in is an absolute step count; offset by what a resumed chain
    # already skipped (the merged chain starts at start_step).
    discard = max(0, burn_in - start_step) // args.thin
    summary = summarize(fit, chain, discard=discard)
    summary["walltime_sec"] = dt
    summary["evals_per_sec"] = evals / dt
    print(format_summary(summary))

    _write_outputs(args, fit, chain, summary, discard)
    return 0


def _write_outputs(args, fit, chain, summary, discard):
    import json
    import numpy as np

    from cosmax.report import plots

    if not args.out:
        return
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    np.save(
        os.path.join(args.out, "chain.npy"),
        np.asarray(chain.samples)[discard:],
    )
    if not args.no_plots:
        flat = np.asarray(chain.flat(discard=discard))
        plots.corner(flat, labels=list(fit.spec.names)).savefig(
            os.path.join(args.out, "corner.png"), dpi=120
        )
        plots.trace(
            np.asarray(chain.samples), labels=list(fit.spec.names)
        ).savefig(os.path.join(args.out, "trace.png"), dpi=100)
        _prediction_plots(fit, summary, args.out)
    print(f"# wrote {args.out}/summary.json, chain.npy"
          + ("" if args.no_plots else ", corner.png, trace.png, predictions"))


def _prediction_plots(fit, summary, out_dir):
    """Per-probe prediction + residual figures at the posterior median
    (the reference's plot_predictions/plot_bao_predictions/
    plot_cc_predictions panels)."""
    import numpy as np

    from cosmax.report import plots

    medians = np.array([summary["params"][n]["median"] for n in fit.spec.names])
    p = fit.derive(fit.spec.unpack(medians.astype(np.float64)))
    for term in fit.terms:
        kind = term.meta.get("plot_kind")
        try:
            if kind == "sn":
                z = term.meta["z"]
                order = np.argsort(z)
                theory = np.asarray(term.meta["theory_mag"](p))
                fig = plots.predictions_sn(
                    z, term.meta["values"], term.meta["errors"],
                    z[order], theory[order],
                    title=str(term.meta.get("legend", term.name)),
                )
                # interactive analogue of the reference's CheckButtons
                # error-bar toggle (sn/plotting.py:29-40) — headless
                # runs get a standalone HTML file instead of a GUI
                from cosmax.report.html import hubble_diagram_html

                hubble_diagram_html(
                    z, term.meta["values"], term.meta["errors"],
                    z[order], theory[order],
                    os.path.join(out_dir, f"predictions_{term.name}.html"),
                    title=str(term.meta.get("legend", term.name)),
                )
            elif kind == "bao":
                curve = term.meta["theory_curve"]
                fig = plots.predictions_bao(
                    term.meta["z"], term.meta["values"], term.meta["errors"],
                    term.meta["quantity"],
                    lambda zg, q: np.asarray(curve(p, zg, q)),
                    title=str(term.meta.get("legend", term.name)),
                )
            elif kind == "cc":
                z = term.meta["z"]
                zg = np.linspace(0.0, float(z.max()) * 1.05, 200)
                fig = plots.predictions_cc(
                    z, term.meta["values"], term.meta["errors"],
                    zg, np.asarray(term.meta["theory_curve"](p, zg)),
                    title=str(term.meta.get("legend", term.name)),
                )
            else:
                continue
            fig.savefig(
                os.path.join(out_dir, f"predictions_{term.name}.png"), dpi=120
            )
        except Exception as e:  # plots must never kill a finished fit
            print(f"# prediction plot for {term.name} failed: {e}")


if __name__ == "__main__":
    sys.exit(main())
