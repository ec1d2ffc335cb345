#!/usr/bin/env python
"""Probe 3: is the exact-bilinear gather priced by index COHERENCE?

sampler_split_probe + sampler_idx_barrier_probe measured (one window):
  gather+lerp+pack, trig/footprint indices  40.5-44.2 ms
  same pipeline, cheap scattered indices    18.7 ms
  barriers (pre- or post-gather)            no effect
So neither fusion shape nor the trig cost explains the 2x — only the
index VALUES differ: footprint indices are spatially coherent (smooth UV
over the sphere -> neighboring pixels hit neighboring/same texel rows),
the cheap ones are pseudo-random. This probe isolates that:

  g_coherent   take only, trig-footprint indices
  g_hashed     take only, (footprint idx * A) mod N — same duplicate
               structure, coherence destroyed; if THIS is fast, a
               pre-shuffled table + in-sampler hash is a free bit-exact
               production win
  g_scattered  take only, cheap pseudo-random indices (control)
  g_sorted     take only, iota indices (maximally coherent, no trig)
  full_hashed  the full sampler with a hash-scattered table (the
               candidate production formulation, end to end)

Prints one JSON line per variant (marginal ms per 1080p pass).
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
N = (TH + 1) * TW
# multiplicative hash: odd, ~golden-ratio fraction of N, coprime with N
A = 2654435761 % N
if A % 2 == 0:
    A += 1


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
    # hash-scattered copy: shuffled[(i * A) % N] = cr_flat[i]
    perm = (jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(A)) % jnp.uint32(N)
    shuffled = jnp.zeros_like(cr_flat).at[perm.astype(jnp.int32)].set(cr_flat)

    ii = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def dirs(s):
        a = ii * 0.0029 + s * 0.11
        b = jj * 0.0017 + s * 0.07
        return jnp.cos(a) * jnp.cos(b), jnp.sin(a), jnp.cos(a) * jnp.sin(b)

    def foot_idx(s):
        u, v = sampling._equirect_uv(*dirs(s))
        x0, y0f, fx, fy = sampling._footprint(u, v, TW, TH)
        row = jnp.clip(y0f + 1, 0, TH)
        return (row * TW + x0).reshape(-1), fx, fy

    def idx_cheap(s):
        return (
            (ii.astype(jnp.int32) * 977 + jj.astype(jnp.int32) * 331
             + (s * 1000.0).astype(jnp.int32))
            % N
        ).reshape(-1)

    def hash_idx(idx):
        return ((idx.astype(jnp.uint32) * jnp.uint32(A)) % jnp.uint32(N)).astype(
            jnp.int32
        )

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

    def full_hashed(s):
        idx, fx, fy = foot_idx(s)
        words = jnp.take(shuffled, hash_idx(idx), axis=0)
        return lerp_pack(words.reshape(H, W, 3), fx, fy)

    variants = {
        "g_coherent": lambda s: jnp.take(cr_flat, foot_idx(s)[0], axis=0),
        "g_hashed": lambda s: jnp.take(
            shuffled, hash_idx(foot_idx(s)[0]), axis=0
        ),
        "g_scattered": lambda s: jnp.take(cr_flat, idx_cheap(s), axis=0),
        "g_sorted": lambda s: jnp.take(
            cr_flat,
            (jnp.arange(H * W, dtype=jnp.int32)
             + (s * 100).astype(jnp.int32)) % N,
            axis=0,
        ),
        "full_hashed": full_hashed,
    }
    for name, fn in variants.items():
        try:
            ms = slope_ms(fn)
            print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
