#!/usr/bin/env python
"""Isolate the texture-sampler stage costs on the real TPU.

Round-3 surprise: the subsampled/checker/luma samplers measured SLOWER
end-to-end than full-res sampling despite gathering fewer indices. This
bench times each sampler (and its building blocks) on FIXED direction
planes — no geodesics — via the fused-scan slope protocol, to find where
the time actually goes (suspects: stride-2 lane slicing, stack+reshape
lane interleaves, the 33.5 MB corner-packed luma table).

Prints one JSON line per variant.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def slope_ms(make_out, n1=3, n2=12):
    """Per-iteration ms of make_out(i) via scan slopes with fresh inputs."""

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
        corner_pack_texture,
        luma_pack_texture,
        pack_texture_rgba8,
        sample_equirect_packed,
        sample_equirect_packed_checkerboard,
        sample_equirect_packed_luma,
        sample_equirect_packed_subsampled,
    )

    H, W = 1080, 1920
    sky = procedural_starfield(2048, 4096, seed=2020)
    packed = jnp.asarray(pack_texture_rgba8(sky))
    cp = jax.jit(corner_pack_texture)(packed)
    lp = jax.jit(luma_pack_texture)(packed)
    status = jnp.zeros((H, W), jnp.int32)

    def dirs(s):
        yy = jnp.linspace(-0.4, 0.4, H)[:, None] + 0.0013 * s
        xx = jnp.linspace(-0.9, 0.9, W)[None, :] + 0.0007 * s
        vx = jnp.broadcast_to(jnp.sin(xx), (H, W))
        vy = jnp.broadcast_to(yy, (H, W))
        vz = jnp.broadcast_to(jnp.cos(xx), (H, W))
        return vx, vy, vz

    def pack_rgb(r, g, b):
        q = lambda c: jnp.round(jnp.clip(c, 0.0, 1.0) * 255.0).astype(jnp.uint32)
        return q(r) | (q(g) << 8) | (q(b) << 16)

    variants = {
        "nearest_full": lambda s: pack_rgb(
            *sample_equirect_packed(packed, *dirs(s), filter="nearest")
        ),
        "bilinear_full_cp": lambda s: pack_rgb(
            *sample_equirect_packed(cp, *dirs(s))
        ),
        "nearest_texsub2": lambda s: pack_rgb(
            *sample_equirect_packed_subsampled(
                packed, *dirs(s), status, 2, filter="nearest"
            )
        ),
        "nearest_checker": lambda s: pack_rgb(
            *sample_equirect_packed_checkerboard(
                packed, *dirs(s), status, filter="nearest"
            )
        ),
        "luma": lambda s: pack_rgb(
            *sample_equirect_packed_luma(lp, *dirs(s), status, chroma_sub=2)
        ),
        "luma_chroma_full": lambda s: pack_rgb(
            *sample_equirect_packed_luma(lp, *dirs(s), status, chroma_sub=1)
        ),
        # building blocks
        "just_dirs": lambda s: pack_rgb(*dirs(s)),
        "stride2_slice": lambda s: dirs(s)[0][::2, ::2].astype(jnp.uint32),
        "take_2M_from_32MB": lambda s: jnp.take(
            packed.reshape(-1),
            (
                (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * 977
                 + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) * 331
                 + (s * 1000).astype(jnp.int32))
                % (2048 * 4096)
            ),
        ),
        "take_2M_from_33.5MB": lambda s: jnp.take(
            lp[0].reshape(-1),
            (
                (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * 977
                 + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) * 331
                 + (s * 1000).astype(jnp.int32))
                % (2049 * 4096)
            ),
        ),
        "take_0.5M_from_32MB": lambda s: jnp.take(
            packed.reshape(-1),
            (
                (jax.lax.broadcasted_iota(jnp.int32, (540, 960), 0) * 977
                 + jax.lax.broadcasted_iota(jnp.int32, (540, 960), 1) * 331
                 + (s * 1000).astype(jnp.int32))
                % (2048 * 4096)
            ),
        ),
    }
    for name, fn in variants.items():
        try:
            ms = slope_ms(fn)
            print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
