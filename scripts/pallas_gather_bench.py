#!/usr/bin/env python
"""Feasibility + timing of IN-KERNEL gather primitives on the real TPU.

Probes what Mosaic can lower (JAX 0.9, v5e), for the in-kernel texture
sampler design:

  tal0   — jnp.take_along_axis(table, idx, axis=0) on a (1024,128) VMEM
           block: sublane-axis dynamic gather
  tal1   — jnp.take_along_axis(row, idx, axis=1) on a (8,512) block:
           lane-axis dynamic gather
  roll   — pltpu.roll butterfly: per-lane arbitrary permutation via 7
           rounds of uniform-roll + select (the fallback if tal1 fails)
  take1d — jnp.take(flat_table, idx) inside the kernel

Each variant compiles a tiny kernel, checks correctness against numpy, and
times a scaled-up version with the slope protocol. Prints one JSON line per
variant.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_kernel(kernel, out_shape, inputs, **kw):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        **kw,
    )(*inputs)


def check(name, fn):
    try:
        ok, detail = fn()
        print(json.dumps({"variant": name, "ok": bool(ok), "detail": detail}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": name, "ok": False, "error": str(e)[:300]}), flush=True)


def main():
    rng = np.random.default_rng(1)

    # --- tal0: sublane-axis take_along_axis --------------------------------
    def tal0():
        tbl = jnp.asarray(rng.integers(0, 2**31, (1024, 128), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, 1024, (8, 128), dtype=np.int32))

        def kernel(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32), [tbl, idx])
        want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=0)
        return np.array_equal(np.asarray(out), want), "exact"

    check("tal0", tal0)

    # --- tal0 with uint32 (texture dtype) -----------------------------------
    def tal0_u32():
        tbl = jnp.asarray(rng.integers(0, 2**32, (1024, 128), dtype=np.uint32))
        idx = jnp.asarray(rng.integers(0, 1024, (8, 128), dtype=np.int32))

        def kernel(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, 128), jnp.uint32), [tbl, idx])
        want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=0)
        return np.array_equal(np.asarray(out), want), "exact"

    check("tal0_u32", tal0_u32)

    # --- tal1: lane-axis take_along_axis ------------------------------------
    def tal1():
        tbl = jnp.asarray(rng.integers(0, 2**31, (8, 512), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, 512, (8, 512), dtype=np.int32))

        def kernel(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, 512), jnp.int32), [tbl, idx])
        want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=1)
        return np.array_equal(np.asarray(out), want), "exact"

    check("tal1", tal1)

    # --- roll butterfly: out[i, j] = x[i, (j + amt[i, j]) % 128] ------------
    def roll_butterfly():
        x = jnp.asarray(rng.integers(0, 2**31, (8, 128), dtype=np.int32))
        tgt = jnp.asarray(rng.integers(0, 128, (8, 128), dtype=np.int32))

        def kernel(x_ref, tgt_ref, out_ref):
            lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            amt = (tgt_ref[:] - lanes) % 128
            v = x_ref[:]
            for k in range(7):
                rolled = pltpu.roll(v, -(1 << k), 1)
                bit = (amt >> k) & 1
                v = v + (rolled - v) * bit  # select without scalar operands
            out_ref[:] = v

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32), [x, tgt])
        want = np.take_along_axis(np.asarray(x), np.asarray(tgt), axis=1)
        return np.array_equal(np.asarray(out), want), "exact"

    check("roll", roll_butterfly)

    # --- take1d: flat jnp.take inside the kernel ----------------------------
    def take1d():
        tbl = jnp.asarray(rng.integers(0, 2**31, (131072,), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, 131072, (8, 128), dtype=np.int32))

        def kernel(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:])

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32), [tbl, idx])
        want = np.asarray(tbl)[np.asarray(idx)]
        return np.array_equal(np.asarray(out), want), "exact"

    check("take1d", take1d)

    # --- timing: tal0 at scale ----------------------------------------------
    # 2M lookups from a (2048, 128) table: grid over (8, 128) pixel tiles,
    # whole table resident per tile. Measures the sublane-gather rate.
    def tal0_timing():
        TBL_H = 2048
        tbl = jnp.asarray(rng.integers(0, 2**32, (TBL_H, 128), dtype=np.uint32))
        H, W = 1080, 1920
        HP, WP = 1080, 1920  # 135 x 15 tiles of (8, 128)

        def kernel(seed_ref, tbl_ref, out_ref):
            i = pl.program_id(0)
            j = pl.program_id(1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) + i * 8
            cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) + j * 128
            h = (rows * 1619 + cols * 31337 + seed_ref[0]) & 0x7FFFFFFF
            idx = h % TBL_H
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx, axis=0)

        @jax.jit
        def one(seed):
            return pl.pallas_call(
                kernel,
                grid=(HP // 8, WP // 128),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((TBL_H, 128), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((HP, WP), jnp.uint32),
            )(seed, tbl)

        @jax.jit
        def scanned(seeds):
            def step(c, s):
                return c, one(jnp.stack([s]))[0, 0]

            _, outs = jax.lax.scan(step, 0, seeds)
            return outs

        def run(n, k):
            seeds = jnp.arange(n, dtype=jnp.int32) * 7919 + k
            return jax.block_until_ready(scanned(seeds))

        run(2, 1)
        run(8, 2)
        t0 = time.perf_counter(); run(2, 3); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(8, 4); t2 = time.perf_counter() - t0
        ms = (t2 - t1) / 6 * 1000.0
        return True, f"{ms:.2f} ms per 2M-lookup pass"

    check("tal0_timing", tal0_timing)


if __name__ == "__main__":
    main()
