#!/usr/bin/env python
"""Where do the exact-bilinear sampler's non-gather milliseconds go?

profile_frame.py shows the whole texture epilogue as ONE XLA fusion
(27.3 ms/frame throttled at 1080p) while the raw slice-3 row gather alone
measures ~17.7 ms (rowgather_bench.py). This probe decomposes the fusion:

  uv_trig      directions -> (u, v)            (rsqrt + arctan2 + arcsin)
  footprint    (u, v) -> idx/fx/fy             (floor/mod/clip)
  gather_only  idx -> (P, 3) corner words      (the HBM row gather)
  lerp_pack    words + fx/fy -> packed frame   (unpack, 3x bilinear, pack)
  full         directions -> packed frame      (the production epilogue)
  full_split   same, optimization_barrier between gather and its
               consumers — does splitting the fusion free the elementwise
               work from the gather's loop?
  full_uv_pre  gather+lerp+pack with u, v precomputed (trig excluded)

Prints one JSON line per variant (marginal ms per 1080p pass, fresh
inputs per scan step — replay/caching-proof per BENCHMARKS.md protocol).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bhr_tpu.ops import sampling

H, W = 1080, 1920
TH, TW = 2048, 4096


def slope_ms(make_out, n1=3, n2=12):
    @jax.jit
    def scanned(seeds):
        def step(c, s):
            out = make_out(s)
            return c, jnp.sum(out.reshape(-1)[::173].astype(jnp.float32))

        _, outs = jax.lax.scan(step, 0, seeds)
        return outs

    def run(n, k):
        seeds = jnp.arange(n, dtype=jnp.float32) * 0.37 + k
        return jax.block_until_ready(scanned(seeds))

    run(n1, 1.0)
    run(n2, 2.0)
    t0 = time.perf_counter(); run(n1, 3.0); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(n2, 4.0); t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1) * 1000.0


def main():
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(
        key, (TH, TW), 0, 2**31 - 1, jnp.int32
    ).astype(jnp.uint32)
    cr = sampling.corner_pack_texture_rows(packed)
    cr_flat = cr.reshape(-1, 3)

    ii = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def dirs(s):
        # smooth, per-seed-fresh direction planes spanning the sphere
        a = ii * 0.0029 + s * 0.11
        b = jj * 0.0017 + s * 0.07
        return jnp.cos(a) * jnp.cos(b), jnp.sin(a), jnp.cos(a) * jnp.sin(b)

    def uv(s):
        return sampling._equirect_uv(*dirs(s))

    def foot(s):
        u, v = uv(s)
        x0, y0f, fx, fy = sampling._footprint(u, v, TW, TH)
        row = jnp.clip(y0f + 1, 0, TH)
        return (row * TW + x0), fx, fy

    def idx_cheap(s):
        # gather indices WITHOUT the trig (same footprint statistics)
        return (
            (ii.astype(jnp.int32) * 977 + jj.astype(jnp.int32) * 331
             + (s * 1000.0).astype(jnp.int32))
            % ((TH + 1) * TW)
        ).reshape(-1)

    def lerp_pack(words, fx, fy):
        s255 = jnp.float32(1.0 / 255.0)
        out = []
        for c in range(3):
            word = words[..., c]
            t00 = (word & jnp.uint32(0xFF)).astype(jnp.float32) * s255
            t10 = ((word >> 8) & jnp.uint32(0xFF)).astype(jnp.float32) * s255
            t01 = ((word >> 16) & jnp.uint32(0xFF)).astype(jnp.float32) * s255
            t11 = (word >> 24).astype(jnp.float32) * s255
            out.append(sampling._lerp2d(t00, t10, t01, t11, fx, fy))
        return sampling.pack_rgba8_planes(*out)

    fixed_words = jax.random.randint(
        jax.random.PRNGKey(1), (H, W, 3), 0, 2**31 - 1, jnp.int32
    ).astype(jnp.uint32)

    variants = {
        "uv_trig": lambda s: jnp.stack(uv(s)),
        "footprint": lambda s: foot(s)[0],
        "gather_only": lambda s: jnp.take(cr_flat, idx_cheap(s), axis=0),
        "lerp_pack": lambda s: lerp_pack(
            fixed_words ^ (s * 97.0).astype(jnp.uint32),
            ii * 0.0003 + s * 0.01 % 1.0,
            jj * 0.0003,
        ),
        "full": lambda s: (
            lambda r: sampling.pack_rgba8_planes(*r)
        )(sampling._sample_corner_rows(cr, *uv(s))),
    }

    def full_split(s):
        u, v = uv(s)
        x0, y0f, fx, fy = sampling._footprint(u, v, TW, TH)
        row = jnp.clip(y0f + 1, 0, TH)
        idx = (row * TW + x0).reshape(-1)
        words = jnp.take(cr_flat, idx, axis=0)
        words, fx, fy = jax.lax.optimization_barrier((words, fx, fy))
        return lerp_pack(words.reshape(H, W, 3), fx, fy)

    variants["full_split"] = full_split

    def full_uv_pre(s):
        # trig excluded: index pattern from cheap math, rest identical
        idx = idx_cheap(s)
        words = jnp.take(cr_flat, idx, axis=0)
        return lerp_pack(
            words.reshape(H, W, 3), ii * 0.0003 + s * 0.01, jj * 0.0003
        )

    variants["full_uv_pre"] = full_uv_pre

    for name, fn in variants.items():
        try:
            ms = slope_ms(fn)
            print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()

