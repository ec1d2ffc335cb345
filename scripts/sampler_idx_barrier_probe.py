#!/usr/bin/env python
"""Follow-up to sampler_split_probe: materialize gather indices.

sampler_split_probe measured full=44.2 / full_split(post-gather barrier)
=44.2 / full_uv_pre(cheap indices)=18.7 in one window: the exact-bilinear
sampler pays ~2x when the trig index chain feeds jnp.take directly --
XLA fuses the index computation into the gather loop. Variants here put
jax.lax.optimization_barrier BEFORE the take (on idx alone, and on
idx+fx+fy), which is numerically a no-op.
"""

import json, os, sys, time
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

    run(n1, 1.0); run(n2, 2.0)
    t0 = time.perf_counter(); run(n1, 3.0); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(n2, 4.0); t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1) * 1000.0


def main():
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (TH, TW), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
    cr = sampling.corner_pack_texture_rows(packed)
    cr_flat = cr.reshape(-1, 3)
    ii = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def dirs(s):
        a = ii * 0.0029 + s * 0.11
        b = jj * 0.0017 + s * 0.07
        return jnp.cos(a) * jnp.cos(b), jnp.sin(a), jnp.cos(a) * jnp.sin(b)

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

    def body(s, barrier):
        u, v = sampling._equirect_uv(*dirs(s))
        x0, y0f, fx, fy = sampling._footprint(u, v, TW, TH)
        row = jnp.clip(y0f + 1, 0, TH)
        idx = (row * TW + x0).reshape(-1)
        if barrier == "idx":
            idx = jax.lax.optimization_barrier(idx)
        elif barrier == "all":
            idx, fx, fy = jax.lax.optimization_barrier((idx, fx, fy))
        words = jnp.take(cr_flat, idx, axis=0)
        return lerp_pack(words.reshape(H, W, 3), fx, fy)

    variants = {
        "full_again": lambda s: body(s, None),
        "idx_barrier": lambda s: body(s, "idx"),
        "idx_fxfy_barrier": lambda s: body(s, "all"),
    }
    for name, fn in variants.items():
        try:
            ms = slope_ms(fn)
            print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
