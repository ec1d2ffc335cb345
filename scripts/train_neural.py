#!/usr/bin/env python
"""Train the Phase-5 neural geodesic surrogate (models/neural.py).

Generates oracle-traced training data (ops/trace.py at the library-default
workload: max_steps=500, dt=0.1), trains the MLP with Adam fully on-device
(one fused lax.scan per log window), evaluates on held-out rays, and writes
the weights to bhr_tpu/assets/neural_schwarzschild.npz (the renderer's
default for integrator="neural").

Reference: docs/ROADMAP.md:1217-1337 (the roadmap's GeodesicMLP plan;
success criteria "inference < 1/10 integration time, SSIM > 0.99").

Usage:
    python scripts/train_neural.py                 # full run (TPU, ~min)
    python scripts/train_neural.py --cpu --quick   # smoke run
"""

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4_000_000)
    ap.add_argument("--eval-rays", type=int, default=262_144)
    ap.add_argument("--steps", type=int, default=40_000)
    ap.add_argument("--batch", type=int, default=16_384)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--hidden", type=str, default="96,96,96")
    ap.add_argument("--max-steps", type=int, default=500)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--out",
        type=str,
        default=str(REPO / "bhr_tpu" / "assets" / "neural_schwarzschild.npz"),
    )
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument(
        "--quick", action="store_true", help="tiny smoke run (CI-sized)"
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bhr_tpu.models import neural

    if args.quick:
        args.rays = min(args.rays, 200_000)
        args.eval_rays = 32_768
        args.steps = min(args.steps, 2_000)
        args.max_steps = min(args.max_steps, 200)

    hidden = tuple(int(x) for x in args.hidden.split(","))
    key = jax.random.PRNGKey(args.seed)
    k_train, k_eval, k_fit = jax.random.split(key, 3)

    print(
        f"device={jax.devices()[0]} rays={args.rays} steps={args.steps} "
        f"hidden={hidden} max_steps={args.max_steps}",
        flush=True,
    )
    t0 = time.time()
    dataset = neural.make_dataset(
        k_train, args.rays, max_steps=args.max_steps, dt=args.dt
    )
    eval_set = neural.make_dataset(
        k_eval, args.eval_rays, max_steps=args.max_steps, dt=args.dt
    )
    cap_frac = float(dataset["captured"].mean())
    print(
        f"dataset: {time.time() - t0:.1f}s, captured fraction {cap_frac:.3f}",
        flush=True,
    )

    t1 = time.time()
    result = neural.train(
        k_fit,
        dataset,
        hidden=hidden,
        steps=args.steps,
        batch_size=args.batch,
        lr=args.lr,
    )
    print(
        f"train: {time.time() - t1:.1f}s, loss "
        f"{result.loss_history[0]:.5f} -> {result.final_loss:.5f}",
        flush=True,
    )

    metrics = neural.evaluate(result.params, eval_set)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    neural.save_params(
        str(out),
        result.params,
        meta=dict(
            hidden=hidden,
            max_steps=args.max_steps,
            dt=args.dt,
            train_rays=args.rays,
            train_steps=args.steps,
            final_loss=result.final_loss,
            **{k: v for k, v in metrics.items()},
        ),
    )
    print(json.dumps({"out": str(out), **metrics}))


if __name__ == "__main__":
    main()
