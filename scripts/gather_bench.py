#!/usr/bin/env python
"""Microbenchmark: texture-gather formulations on the real TPU.

VERDICT round-1 #1: the texture-skybox path costs ~120 ms/frame at 1080p
(4 corner gathers x ~30 ms). This script measures candidate formulations of
"2M bilinear samples from a 4K equirect packed-u32 texture" to find one that
fits the <=25 ms frame budget:

  corner4    — the current sample_equirect_packed (4 2D fancy-index gathers)
  flat4      — 4 jnp.take gathers with flattened 1D indices
  flat1      — 1 jnp.take (nearest-neighbor; the per-gather cost floor)
  window1    — one lax.gather with slice_sizes=(2,2) on a (+1,+1)-padded
               texture: full bilinear footprint in ONE gather pass
  window1row — one lax.gather slice_sizes=(1,2) on a fy-quantized texture
               stack (probe: does slice size or index count dominate?)
  coalesced1 — 1 jnp.take with iota indices (is cost per-index or
               access-pattern-bound?)
  smalltab   — 1 jnp.take from a 512x1024 mip (does table size matter?)

Run on the TPU host:  python scripts/gather_bench.py
Prints one JSON line per variant: {"variant": ..., "ms_per_pass": ...}

Timing uses the fused-scan slope protocol (two scan lengths, fresh content
per step via an index permutation keyed on the scan counter) — the only
method that survives this environment's dispatch overhead and remote
result caching (docs/DESIGN.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
TH, TW = 2048, 4096  # 4K equirect
N = H * W


def slope_ms(fn, n1=2, n2=8):
    """Per-iteration ms of jitted fn(offsets) scanned over fresh offsets."""

    def run(n, seed):
        offs = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761) + jnp.uint32(seed)
        return jax.block_until_ready(fn(offs))

    run(n1, 1)
    run(n2, 2)
    t0 = time.perf_counter()
    run(n1, 3)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(n2, 4)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1) * 1000.0


def main():
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.integers(0, 2**32, size=(TH, TW), dtype=np.uint32))
    # padded texture: wrap column (Repeat-U), clamp row (Clamp-V)
    tex_pad = jnp.concatenate([tex, tex[:, :1]], axis=1)
    tex_pad = jnp.concatenate([tex_pad, tex_pad[-1:, :]], axis=0)  # (2049, 4097)
    tex_small = tex[::4, ::4][:512, :1024]

    y0 = jnp.asarray(rng.integers(0, TH - 1, size=(H, W), dtype=np.int32))
    x0 = jnp.asarray(rng.integers(0, TW, size=(H, W), dtype=np.int32))

    def perturb(offs_k):
        # cheap per-step index reshuffle (stays uniform, defeats caching)
        xs = (x0.astype(jnp.uint32) + offs_k) * jnp.uint32(2654435761)
        ys = (y0.astype(jnp.uint32) * jnp.uint32(2246822519) + offs_k)
        return (
            (ys % jnp.uint32(TH - 1)).astype(jnp.int32),
            (xs % jnp.uint32(TW)).astype(jnp.int32),
        )

    def scanned(body):
        def fn(offs):
            def step(c, o):
                yy, xx = perturb(o)
                return c, body(yy, xx)

            _, outs = jax.lax.scan(step, 0, offs)
            return outs[-1]

        return jax.jit(fn)

    variants = {}

    def corner4(yy, xx):
        x1 = jnp.where(xx + 1 >= TW, 0, xx + 1)
        y1 = jnp.minimum(yy + 1, TH - 1)
        return (
            tex[yy, xx] ^ tex[yy, x1] ^ tex[y1, xx] ^ tex[y1, x1]
        )

    variants["corner4"] = scanned(corner4)

    flat = tex.reshape(-1)

    def flat4(yy, xx):
        x1 = jnp.where(xx + 1 >= TW, 0, xx + 1)
        y1 = jnp.minimum(yy + 1, TH - 1)
        i00 = yy * TW + xx
        i10 = yy * TW + x1
        i01 = y1 * TW + xx
        i11 = y1 * TW + x1
        return (
            jnp.take(flat, i00) ^ jnp.take(flat, i10)
            ^ jnp.take(flat, i01) ^ jnp.take(flat, i11)
        )

    variants["flat4"] = scanned(flat4)
    variants["flat1"] = scanned(lambda yy, xx: jnp.take(flat, yy * TW + xx))

    def window1(yy, xx):
        idx = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
        g = jax.lax.gather(
            tex_pad,
            idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2),
                collapsed_slice_dims=(),
                start_index_map=(0, 1),
            ),
            slice_sizes=(2, 2),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        return (g[:, 0, 0] ^ g[:, 0, 1] ^ g[:, 1, 0] ^ g[:, 1, 1]).reshape(H, W)

    variants["window1"] = scanned(window1)

    def window1row(yy, xx):
        idx = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
        g = jax.lax.gather(
            tex_pad,
            idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2),
                collapsed_slice_dims=(),
                start_index_map=(0, 1),
            ),
            slice_sizes=(1, 2),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        return (g[:, 0, 0] ^ g[:, 0, 1]).reshape(H, W)

    variants["window1row"] = scanned(window1row)

    iota = jnp.arange(N, dtype=jnp.int32) % (TH * TW)

    def coalesced1(yy, xx):
        del yy
        i = (iota + xx.reshape(-1)[0]) % (TH * TW)
        return jnp.take(flat, i).reshape(H, W)

    variants["coalesced1"] = scanned(coalesced1)

    flat_small = tex_small.reshape(-1)
    ns = flat_small.shape[0]

    def smalltab(yy, xx):
        i = (yy * 1024 + (xx % 1024)) % ns
        return jnp.take(flat_small, i)

    variants["smalltab"] = scanned(smalltab)

    import os
    only = os.environ.get("BHR_GATHER_ONLY")
    for name, fn in variants.items():
        if only and name not in only.split(","):
            continue
        try:
            ms = slope_ms(fn)
            print(json.dumps({"variant": name, "ms_per_pass": round(ms, 2)}), flush=True)
        except Exception as e:  # keep measuring the rest
            print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
