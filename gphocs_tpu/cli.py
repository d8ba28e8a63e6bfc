"""Command-line interface, compatible with the reference binary's usage:

    python -m gphocs_tpu [-v] [-n threads] <control-file> [secondary-control]

(reference src/GPhoCS.c:28-249).  `-n` is accepted for compatibility but
parallelism is governed by the JAX device mesh instead.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="gphocs-tpu",
        description="TPU-native G-PhoCS: Bayesian coalescent MCMC for "
                    "demographic inference")
    ap.add_argument("control_file")
    ap.add_argument("secondary_control", nargs="?", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("-n", "--nthreads", type=int, default=0,
                    help="accepted for reference compatibility (ignored; "
                         "use the JAX device mesh)")
    ap.add_argument("--x64", action="store_true", default=None,
                    help="force float64 (default on CPU; float32 on TPU)")
    ap.add_argument("--production-rng", action="store_true",
                    help="use de-correlated per-locus RNG streams instead "
                         "of the reference-compatible identical seeding")
    ap.add_argument("--fast-rng", action="store_true", default=None,
                    help="loop-free counter-based RNG streams (production "
                         "mode; statistically but not bitwise equivalent "
                         "to the reference's stream consumption).  DEFAULT "
                         "on TPU — the benchmark configuration (fast RNG + "
                         "fused whole-sweep kernels) is what "
                         "`python -m gphocs_tpu run.ctl` executes there")
    ap.add_argument("--legacy-rng", action="store_true",
                    help="force the reference-conformance mode "
                         "(Wichmann-Hill streams, bit-compatible "
                         "consumption; the CPU default)")
    ap.add_argument("--buckets", type=int, default=1, metavar="K",
                    help="pattern-axis bucketing for ragged loci: sort "
                         "loci by pattern count into K buckets, each "
                         "padded only to its own max (single device, "
                         "fast RNG, one chain)")
    ap.add_argument("--debug-check", action="store_true",
                    help="run the checkAll-analogue state invariants at "
                         "every log point (reference GPhoCS.c:1814)")
    ap.add_argument("--checkpoint", metavar="PATH",
                    help="checkpoint file (with --checkpoint-every)")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    metavar="N", help="checkpoint every N iterations")
    ap.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint if it exists")
    ap.add_argument("--chains", type=int, default=1,
                    help="independent vmapped chains (R-hat/ESS via "
                         "gphocs_tpu.tools.convergence)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard loci over all visible devices "
                         "(jax.sharding 1-D 'loci' mesh)")
    ap.add_argument("--distributed", metavar="COORD:NPROC:PID",
                    help="multi-host: coordinator address, process count, "
                         "process id (jax.distributed)")
    args = ap.parse_args(argv)

    import jax

    platform = jax.default_backend()
    use_x64 = args.x64 if args.x64 is not None else (platform == "cpu")
    if use_x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from gphocs_tpu.config import parse_control_file
    from gphocs_tpu.sampler.driver import Sampler

    if args.distributed:
        from gphocs_tpu.parallel.mesh import init_distributed

        coord, nproc, pid = args.distributed.rsplit(":", 2)
        init_distributed(coord, int(nproc), int(pid))

    mesh = None
    if args.mesh or args.distributed:
        from gphocs_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    # mode resolution: TPU defaults to the PRODUCTION configuration (fast
    # RNG + fused kernels — the exact path bench.py measures); CPU
    # defaults to the conformance mode (legacy RNG, f64).  --legacy-rng /
    # --fast-rng override explicitly; contradictions raise BEFORE any
    # file parsing (argument validation, support-matrix README.md).
    if args.legacy_rng and args.fast_rng:
        ap.error("--legacy-rng and --fast-rng are mutually exclusive")
    if args.fast_rng is None and not args.legacy_rng:
        fast = platform == "tpu"
    else:
        fast = bool(args.fast_rng) and not args.legacy_rng
    if args.buckets > 1 and (args.chains > 1 or not fast):
        ap.error("--buckets requires fast RNG and one chain "
                 "(see the support matrix in README.md)")
    cfg = parse_control_file(args.control_file, args.secondary_control)
    print(f"gphocs_tpu on {platform} "
          f"({len(jax.devices())} device(s)), "
          f"{'float64' if use_x64 else 'float32'}, "
          f"{'fast' if fast else 'legacy'} RNG")
    t0 = time.time()
    sampler = Sampler(cfg, dtype=jnp.float64 if use_x64 else jnp.float32,
                      legacy_rng=not args.production_rng,
                      verbose=args.verbose, mesh=mesh,
                      chains=args.chains,
                      rng_mode="fast" if fast else "legacy",
                      buckets=args.buckets)
    if platform == "tpu" and not sampler.use_fused and fast:
        print("note: fused kernels disabled (GPHOCS_FUSED=0 or f64)",
              file=sys.stderr)
    print(f"{sampler.num_loci} loci, {cfg.num_samples} samples, "
          f"{cfg.num_pops} pops, {len(cfg.bands)} migration band(s); "
          f"{cfg.num_parameters()} parameters")
    sampler.run(trace_path=cfg.mcmc.trace_file, progress=True,
                checkpoint_path=args.checkpoint,
                checkpoint_every=args.checkpoint_every,
                resume=args.resume,
                debug_check=args.debug_check)
    print(f"MCMC finished. Time used: {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
