#!/usr/bin/env python
"""Probe the v5e's fp32 divide/sqrt lowerings, bit-level.

Finding #1 (recorded): XLA div/sqrt on TPU are NOT correctly rounded —
vs the host's IEEE results, ~35% of random divisions differ (max 2 ulp)
and ~39% of sqrts differ (max 3 ulp). "Exact tier" bit parity therefore
means "identical lowering to the XLA oracle on the same backend", not
IEEE-correct rounding.

This probe asks the follow-up questions that decide whether the exact
kernel can hoist shared work out of same-denominator division groups
(x/r, y/r, z/r, rs/r — 4 of the 8 divisions per step share r):

  1. Does Mosaic's in-kernel a/b bit-match XLA's a/b on TPU?
  2. Which Newton/Markstein sequence (built from pl.reciprocal + mul/add)
     reproduces the native division bit-for-bit?  If one does, computing
     its reciprocal-refinement ONCE per denominator and running only the
     cheap tail per quotient is bit-identical and strictly fewer ops.
  3. Same for sqrt via rsqrt refinement.

Prints one JSON line per comparison: {"check": ..., "mismatch_frac": ...,
"max_ulp": ...} (mismatch vs the XLA-on-TPU result, except *_vs_host).
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 22  # 4M samples
ROWS_PER_BLOCK = 256


def rand_fp32(rng, n, lo=1e-6, hi=1e6):
    m = rng.uniform(np.log(lo), np.log(hi), n).astype(np.float32)
    s = rng.choice([-1.0, 1.0], n).astype(np.float32)
    return (np.exp(m) * s).astype(np.float32)


def ulp_diff(a, b):
    ai = np.asarray(a).view(np.int32).astype(np.int64)
    bi = np.asarray(b).view(np.int32).astype(np.int64)
    ai = np.where(ai < 0, np.int64(-0x80000000) - ai, ai)
    bi = np.where(bi < 0, np.int64(-0x80000000) - bi, bi)
    return np.abs(ai - bi)


def report(name, got, want):
    ud = ulp_diff(got, want)
    print(
        json.dumps(
            {
                "check": name,
                "mismatch_frac": round(float((ud != 0).mean()), 6),
                "max_ulp": int(ud.max()),
            }
        ),
        flush=True,
    )


def run_kernel(body, inputs):
    shape = inputs[0].shape
    grid = (shape[0] // ROWS_PER_BLOCK,)
    spec = pl.BlockSpec((ROWS_PER_BLOCK, shape[1]), lambda i: (i, 0))
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[spec for _ in inputs],
        out_specs=spec,
        grid=grid,
    )(*inputs)


def k_div(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] / b_ref[...]


def k_sqrt(a_ref, o_ref):
    o_ref[...] = jnp.sqrt(a_ref[...])


def k_rsqrt(a_ref, o_ref):
    o_ref[...] = jax.lax.rsqrt(a_ref[...])


def k_recip_approx(b_ref, o_ref):
    o_ref[...] = pl.reciprocal(b_ref[...], approx=True)


def markstein(a, b, n_refine, fixup):
    y = pl.reciprocal(b, approx=True)
    for _ in range(n_refine):
        e = 1.0 - b * y
        y = y + y * e
    q = a * y
    if fixup:
        r = a - b * q
        q = q + r * y
    return q


def k_mark(n_refine, fixup, a_ref, b_ref, o_ref):
    o_ref[...] = markstein(a_ref[...], b_ref[...], n_refine, fixup)


def sqrt_via_rsqrt(a, n_refine, fixup):
    y = jax.lax.rsqrt(a)  # ~1/sqrt(a)
    for _ in range(n_refine):
        y = y * (1.5 - 0.5 * a * y * y)
    s = a * y
    if fixup:
        r = a - s * s
        s = s + r * (0.5 * y)
    return s


def k_sqrt_seq(n_refine, fixup, a_ref, o_ref):
    o_ref[...] = sqrt_via_rsqrt(a_ref[...], n_refine, fixup)


def main():
    rng = np.random.default_rng(7)
    shape = (N // 1024, 1024)
    a = rand_fp32(rng, N).reshape(shape)
    b = rand_fp32(rng, N).reshape(shape)
    want_div_host = (a / b).astype(np.float32)
    want_sqrt_host = np.sqrt(np.abs(a)).astype(np.float32)

    da, db = jnp.asarray(a), jnp.asarray(b)
    dabs = jnp.abs(da)

    xla_div = np.asarray(jax.jit(lambda x, y: x / y)(da, db))
    xla_sqrt = np.asarray(jax.jit(jnp.sqrt)(dabs))
    report("xla_div_vs_host", xla_div, want_div_host)
    report("xla_sqrt_vs_host", xla_sqrt, want_sqrt_host)

    mos_div = np.asarray(run_kernel(k_div, [da, db]))
    mos_sqrt = np.asarray(run_kernel(k_sqrt, [dabs]))
    report("mosaic_div_vs_xla", mos_div, xla_div)
    report("mosaic_sqrt_vs_xla", mos_sqrt, xla_sqrt)

    for n_refine in (1, 2):
        for fixup in (False, True):
            got = np.asarray(
                run_kernel(functools.partial(k_mark, n_refine, fixup), [da, db])
            )
            report(f"markstein_r{n_refine}_f{int(fixup)}_vs_mosaic_div", got, mos_div)
    for n_refine in (0, 1, 2):
        for fixup in (False, True):
            got = np.asarray(
                run_kernel(functools.partial(k_sqrt_seq, n_refine, fixup), [dabs])
            )
            report(f"sqrtseq_r{n_refine}_f{int(fixup)}_vs_mosaic_sqrt", got, mos_sqrt)

    # how close are the raw hardware estimates? (bounds any sequence design)
    est = np.asarray(run_kernel(k_recip_approx, [db]))
    report("recip_approx_vs_host", est, (1.0 / b).astype(np.float32))
    rs = np.asarray(run_kernel(k_rsqrt, [dabs]))
    report("rsqrt_vs_host", rs, (1.0 / np.sqrt(np.abs(a))).astype(np.float32))


if __name__ == "__main__":
    main()
