#!/usr/bin/env python
"""A/B the corner-packed exact-bilinear gather formulations on the v5e.

Round-3's d242096 merged the three per-channel corner-packed takes into one
take over a (3, H*W) stacked index array (motivated by the ~2.6 ms fixed
cost per take op measured in sampler_bench.py). The end-to-end bilinear
tier then measured 67 ms vs round-2's 53.6 — either chip-state spread or a
regression from the merged form (a (3, H, W) gather result may relayout).
This probe times both forms plus a flat-1D-index merged form, isolated from
the geodesic kernel, via the fused-scan slope protocol.

Prints one JSON line per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


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
    from bhr_tpu.io.skybox import procedural_starfield
    from bhr_tpu.ops.sampling import (
        _footprint,
        _lerp2d,
        corner_pack_texture,
        pack_texture_rgba8,
    )

    from bhr_tpu.ops.sampling import corner_pack_texture_rows

    H, W = 1080, 1920
    sky = procedural_starfield(2048, 4096, seed=2020)
    packed = jnp.asarray(pack_texture_rgba8(sky))
    cp = jax.jit(corner_pack_texture)(packed)
    cr = jax.jit(corner_pack_texture_rows)(packed).reshape(-1, 3)
    th, tw = cp.shape[1] - 1, cp.shape[2]
    plane_sz = (th + 1) * tw
    cp_flat = cp.reshape(-1)
    _ = jax.device_get(cp_flat[0])  # init the transfer channel before timing

    def uv(s):
        yy = jnp.linspace(0.1, 0.9, H)[:, None] + 0.00013 * s
        xx = jnp.linspace(0.0, 1.0, W)[None, :] + 0.00007 * s
        u = jnp.broadcast_to(xx, (H, W))
        v = jnp.broadcast_to(yy, (H, W))
        return u, v

    def footprint_idx(s):
        u, v = uv(s)
        x0, y0f, fx, fy = _footprint(u, v, tw, th)
        row = jnp.clip(y0f + 1, 0, th)
        return row * tw + x0, fx, fy

    def lerp_word(word, fx, fy):
        s = jnp.float32(1.0 / 255.0)
        t00 = (word & jnp.uint32(0xFF)).astype(jnp.float32) * s
        t10 = ((word >> 8) & jnp.uint32(0xFF)).astype(jnp.float32) * s
        t01 = ((word >> 16) & jnp.uint32(0xFF)).astype(jnp.float32) * s
        t11 = (word >> 24).astype(jnp.float32) * s
        return _lerp2d(t00, t10, t01, t11, fx, fy)

    def pack_rgb(r, g, b):
        q = lambda c: jnp.round(jnp.clip(c, 0.0, 1.0) * 255.0).astype(jnp.uint32)
        return q(r) | (q(g) << 8) | (q(b) << 16)

    def merged_stacked(s):
        idx, fx, fy = footprint_idx(s)
        flat_idx = jnp.stack([idx + c * plane_sz for c in range(3)])
        words = jnp.take(cp_flat, flat_idx)
        return pack_rgb(*(lerp_word(words[c], fx, fy) for c in range(3)))

    def merged_flat1d(s):
        idx, fx, fy = footprint_idx(s)
        i1 = idx.reshape(-1)
        flat_idx = jnp.concatenate([i1, i1 + plane_sz, i1 + 2 * plane_sz])
        words = jnp.take(cp_flat, flat_idx)
        n = i1.size
        chans = [
            lerp_word(words[c * n : (c + 1) * n].reshape(H, W), fx, fy)
            for c in range(3)
        ]
        return pack_rgb(*chans)

    def three_takes(s):
        idx, fx, fy = footprint_idx(s)
        chans = [
            lerp_word(jnp.take(cp_flat, idx + c * plane_sz), fx, fy)
            for c in range(3)
        ]
        return pack_rgb(*chans)

    def rows_slice3(s):
        idx, fx, fy = footprint_idx(s)
        words = jnp.take(cr, idx.reshape(-1), axis=0)
        planes = jnp.transpose(words, (1, 0)).reshape(3, H, W)
        return pack_rgb(*(lerp_word(planes[c], fx, fy) for c in range(3)))

    def rows_slice3_nt(s):
        # no-transpose variant: lerp directly on the channel-minor result
        idx, fx, fy = footprint_idx(s)
        words = jnp.take(cr, idx.reshape(-1), axis=0).reshape(H, W, 3)
        chans = [lerp_word(words[..., c], fx, fy) for c in range(3)]
        return pack_rgb(*chans)

    only = os.environ.get("BHR_AB_ONLY", "")
    for name, fn in (
        ("rows_slice3_transpose", rows_slice3),
        ("rows_slice3_chanminor", rows_slice3_nt),
        ("merged_stacked_3xHW", merged_stacked),
        ("merged_flat_1d_6M", merged_flat1d),
        ("three_separate_takes", three_takes),
    ):
        if only and only not in name:
            continue
        try:
            ms = slope_ms(fn)
            print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
