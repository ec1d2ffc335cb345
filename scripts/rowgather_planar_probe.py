#!/usr/bin/env python
"""Slice-3 row-gather epilogue forms: hunting a PLANAR-output gather.

bilinear_ab.py round-3 results (one slow window, control stacked=53.9):
  rows_slice3_chanminor  37.25   # take axis=0 -> (P,3), slice minor dim
  rows_slice3_transpose  42.67   # + explicit transpose to (3,P)
The raw k=3 row take alone measured 17.7 ms (rowgather_bench.py, good
window) — so ~15-20 ms of the sampler stage is (P,3) channel-minor
materialization (XLA pads minor dim 3 to the 128-lane tile).

This probe times gather forms whose OUTPUT is already planar (3, P), plus
in-window controls:
  ctrl_take_k3_raw    take axis=0, result consumed by strided sum (the
                      17.7 ms form — fusion avoids materialization)
  ctrl_chanminor      the 37.25 ms production candidate
  g3_planar           lax.gather operand (R,3), slice (1,3), offset dim ->
                      output dim 0: output (3, P) with no transpose
  take_axis1          (3, R) table, take(idx, axis=1) -> (3, P)
Each variant includes the full unpack+lerp+pack epilogue (except the raw
control) so the winner is directly shippable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

H, W = 1080, 1920
TH, TW = 2049, 4096
R = TH * TW
P = H * W


def slope_ms(make_out, n1=3, n2=12):
    @jax.jit
    def scanned(seeds):
        def step(c, s):
            out = make_out(s)
            return c, jnp.sum(out[..., ::173].astype(jnp.float32))

        _, outs = jax.lax.scan(step, 0, seeds)
        return outs

    ent = (time.time_ns() % 10_000_000) / 1e4

    def run(n, k):
        seeds = jnp.arange(n, dtype=jnp.float32) * 0.37 + k + ent
        return jax.block_until_ready(scanned(seeds))

    run(n1, 1.0)
    run(n2, 2.0)
    t0 = time.perf_counter(); run(n1, 3.0); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(n2, 4.0); t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1) * 1000.0


def main():
    key = jax.random.PRNGKey(0)
    rows3 = jax.random.randint(key, (R, 3), 0, 2**31 - 1, jnp.int32).astype(
        jnp.uint32
    )
    cols3 = jnp.transpose(rows3, (1, 0))  # (3, R)
    _ = jax.device_get(rows3[0, 0])

    def fake_footprint(s):
        ii = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        u = (ii * 0.37 + jj * 0.11 + s) % 1.0
        v = (ii * 0.13 + jj * 0.29 + s * 1.7) % 1.0
        idx = (
            (u * (TW - 1)).astype(jnp.int32) * TW // TW
            + (v * (TH - 1)).astype(jnp.int32) * TW
            + (u * (TW - 1)).astype(jnp.int32)
        ) % R
        return idx, u, v

    def lerp_word(word, fx, fy):
        s = jnp.float32(1.0 / 255.0)
        t00 = (word & jnp.uint32(0xFF)).astype(jnp.float32) * s
        t10 = ((word >> 8) & jnp.uint32(0xFF)).astype(jnp.float32) * s
        t01 = ((word >> 16) & jnp.uint32(0xFF)).astype(jnp.float32) * s
        t11 = (word >> 24).astype(jnp.float32) * s
        top = t00 * (1.0 - fx) + t10 * fx
        bot = t01 * (1.0 - fx) + t11 * fx
        return top * (1.0 - fy) + bot * fy

    def pack_rgb(r, g, b):
        q = lambda c: jnp.round(jnp.clip(c, 0.0, 1.0) * 255.0).astype(jnp.uint32)
        return q(r) | (q(g) << 8) | (q(b) << 16)

    def ctrl_take_k3_raw(s):
        idx, _, _ = fake_footprint(s)
        return jnp.take(rows3, idx.reshape(-1), axis=0)

    def ctrl_chanminor(s):
        idx, fx, fy = fake_footprint(s)
        words = jnp.take(rows3, idx.reshape(-1), axis=0).reshape(H, W, 3)
        return pack_rgb(*(lerp_word(words[..., c], fx, fy) for c in range(3)))

    DN = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def g3_planar(s):
        idx, fx, fy = fake_footprint(s)
        # output (3, P): slice dim -> output dim 0, batch -> dim 1
        planes = jax.lax.gather(
            rows3,
            idx.reshape(-1, 1),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(0,),
                collapsed_slice_dims=(0,),
                start_index_map=(0,),
            ),
            slice_sizes=(1, 3),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        # offset_dims=(0,) with collapsed dim 0 leaves slice shape (3,)
        # at output dim 0 -> (3, P)
        pl3 = planes.reshape(3, H, W)
        return pack_rgb(*(lerp_word(pl3[c], fx, fy) for c in range(3)))

    def take_axis1(s):
        idx, fx, fy = fake_footprint(s)
        pl3 = jnp.take(cols3, idx.reshape(-1), axis=1).reshape(3, H, W)
        return pack_rgb(*(lerp_word(pl3[c], fx, fy) for c in range(3)))

    only = os.environ.get("BHR_PROBE_ONLY", "")
    for name, fn in (
        ("ctrl_take_k3_raw", ctrl_take_k3_raw),
        ("ctrl_chanminor", ctrl_chanminor),
        ("g3_planar", g3_planar),
        ("take_axis1", take_axis1),
    ):
        if only and only not in name:
            continue
        try:
            ms = slope_ms(fn)
            print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(
                json.dumps({"variant": name, "error": repr(e)[:300]}),
                flush=True,
            )


if __name__ == "__main__":
    main()
