#!/usr/bin/env python
"""Is a TPU gather priced per-INDEX or per-WORD?

Round-2's gather_bench established ~7.4 ns per flat index regardless of
table size or locality, making 3-takes-per-pixel (~44 ms at 1080p) the
apparent floor for exact corner-packed bilinear. If XLA's row-gather
(take axis=0 from an (N, k) table) costs the same per index while moving
k words, packing the 3 channel corner-words into one row drops exact
bilinear to ONE 2M-index gather.

Prints one JSON line per variant (ms per 2.07M-pixel pass).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


H, W = 1080, 1920
N = 2048 * 4096


def slope_ms(make_out, n1=3, n2=12):
    @jax.jit
    def scanned(seeds):
        def step(c, s):
            out = make_out(s)
            return c, jnp.sum(out[..., ::173].astype(jnp.float32))

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
    flat = jax.random.randint(key, (N,), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
    rows3 = jnp.stack([flat, flat ^ jnp.uint32(0x5A5A), flat + jnp.uint32(7)], axis=1)
    rows4 = jnp.concatenate([rows3, flat[:, None]], axis=1)
    rows8 = jnp.concatenate([rows4, rows4], axis=1)

    def idx2d(s, h=H, w=W):
        return (
            (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * 977
             + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) * 331
             + (s * 1000).astype(jnp.int32))
            % N
        )

    variants = {
        "flat_take_2M": lambda s: jnp.take(flat, idx2d(s)),
        "flat_take_6M": lambda s: jnp.take(
            flat,
            jnp.stack([idx2d(s), idx2d(s + 11.0), idx2d(s + 23.0)]),
        ),
        "row_take_axis0_k3": lambda s: jnp.take(rows3, idx2d(s).reshape(-1), axis=0),
        "row_take_axis0_k4": lambda s: jnp.take(rows4, idx2d(s).reshape(-1), axis=0),
        "row_take_axis0_k8": lambda s: jnp.take(rows8, idx2d(s).reshape(-1), axis=0),
        # same thing expressed as lax.gather via vmapped dynamic_slice
        "gather_slice_k4": lambda s: jax.vmap(
            lambda i: jax.lax.dynamic_slice(rows4, (i, 0), (1, 4))
        )(idx2d(s).reshape(-1)),
    }
    for name, fn in variants.items():
        try:
            ms = slope_ms(fn)
            print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
