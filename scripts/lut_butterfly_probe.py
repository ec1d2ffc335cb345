#!/usr/bin/env python
"""Probe: vectorized in-kernel 512-entry LUT lookup via a lane butterfly.

Motivation (round-3): fusing accretion-disk shading into the monolithic
kernel needs an in-kernel blackbody-LUT gather. Mosaic has no general
gather, but pltpu.roll is a full-width lane rotation, so
out[i, j] = row[amt] decomposes into log2(W) rounds of
roll-by-2^k + mask-select (a "butterfly"): every output lane independently
accumulates the rotation amounts whose bits are set in
(target_lane - j) mod W. Duplicates are fine — it is a gather, not a
permutation.

Round-2's probe got roll's sign convention wrong; this one measures it
first, then validates the butterfly on (8, 512) and (8, 640) tiles
(the autotuned production tile widths) with a u32-packed LUT.

Prints one JSON line per check.
"""

import json
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_kernel(kernel, out_shape, inputs):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*inputs)


def check(name, fn):
    try:
        ok, detail = fn()
        print(json.dumps({"variant": name, "ok": bool(ok), "detail": detail}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": name, "ok": False,
                          "error": repr(e)[:200],
                          "tb_tail": traceback.format_exc()[-300:]}), flush=True)


def main():
    rng = np.random.default_rng(3)

    def roll_semantics():
        x = jnp.asarray(np.arange(128, dtype=np.int32).reshape(1, 128) * np.ones((8, 1), np.int32))

        def kernel(x_ref, out_ref):
            out_ref[:] = pltpu.roll(x_ref[:], 1, 1)

        out = np.asarray(run_kernel(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32), [x]))
        # out[0] == 127 -> roll right (out[j] = x[(j - s) % n], numpy.roll)
        # out[0] == 1   -> roll left  (out[j] = x[(j + s) % n])
        conv = "right(numpy)" if out[0, 0] == 127 else (
            "left" if out[0, 0] == 1 else f"unknown({out[0,0]})")
        return out[0, 0] in (127, 1), conv

    check("roll_semantics", roll_semantics)

    def butterfly(width, rounds):
        """out[i,j] = row[idx[i,j]] for a (1, width) u32 row table."""
        lut = rng.integers(0, 2**32, (1, width), dtype=np.uint32)
        idx = rng.integers(0, width, (8, width), dtype=np.int32)
        lut_j, idx_j = jnp.asarray(lut), jnp.asarray(idx)

        def kernel(lut_ref, idx_ref, out_ref):
            lanes = jax.lax.broadcasted_iota(jnp.int32, (8, width), 1)
            # we need out lane j to end with the value that started in lane
            # idx[i, j]; rolling RIGHT by s moves lane l -> lane (l+s)%W, so
            # accumulate s = (j - idx) mod W in powers of two
            amt = (lanes - idx_ref[:]) % width
            v = jnp.broadcast_to(lut_ref[:], (8, width))
            for k in range(rounds):
                sh = (1 << k) % width
                rolled = pltpu.roll(v, sh, 1)
                bit = ((amt >> k) & 1).astype(jnp.uint32)
                v = v + (rolled - v) * bit
            out_ref[:] = v

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, width), jnp.uint32),
                         [lut_j, idx_j])
        want = lut[0][idx]
        frac = float((np.asarray(out) == want).mean())
        return frac == 1.0, f"agreement={frac:.4f}"

    check("butterfly_512", lambda: butterfly(512, 9))
    check("butterfly_640", lambda: butterfly(640, 10))

    def butterfly_left(width, rounds):
        """Same, assuming roll is LEFT (out[j] = v[(j+s)%W])."""
        lut = rng.integers(0, 2**32, (1, width), dtype=np.uint32)
        idx = rng.integers(0, width, (8, width), dtype=np.int32)
        lut_j, idx_j = jnp.asarray(lut), jnp.asarray(idx)

        def kernel(lut_ref, idx_ref, out_ref):
            lanes = jax.lax.broadcasted_iota(jnp.int32, (8, width), 1)
            amt = (idx_ref[:] - lanes) % width
            v = jnp.broadcast_to(lut_ref[:], (8, width))
            for k in range(rounds):
                sh = (1 << k) % width
                rolled = pltpu.roll(v, sh, 1)
                bit = ((amt >> k) & 1).astype(jnp.uint32)
                v = v + (rolled - v) * bit
            out_ref[:] = v

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, width), jnp.uint32),
                         [lut_j, idx_j])
        want = lut[0][idx]
        frac = float((np.asarray(out) == want).mean())
        return frac == 1.0, f"agreement={frac:.4f}"

    check("butterfly_left_512", lambda: butterfly_left(512, 9))

    # timing: 2 packed-LUT butterflies (the disk's i0/i1 lerp pair) over a
    # 1080p frame of (8, 512) tiles, vs the kernel-side cost of doing
    # nothing — reports the marginal ms per frame
    def timing():
        import time

        width = 512
        H, W = 1080, 1920
        n_tiles = (H * W) // (8 * width)
        lut = jnp.asarray(rng.integers(0, 2**32, (1, width), dtype=np.uint32))

        def make(n_bfly):
            def kernel(lut_ref, out_ref):
                i = pl.program_id(0)
                rows = jax.lax.broadcasted_iota(jnp.int32, (8, width), 0)
                lanes = jax.lax.broadcasted_iota(jnp.int32, (8, width), 1)
                h = (rows * 131 + lanes * 7919 + i * 2654435761) & 0x7FFFFFFF
                idx = h % width
                acc = jnp.zeros((8, width), jnp.uint32)
                for b in range(n_bfly):
                    amt = (lanes - (idx + b)) % width
                    v = jnp.broadcast_to(lut_ref[:], (8, width))
                    for k in range(9):
                        rolled = pltpu.roll(v, (1 << k) % width, 1)
                        bit = ((amt >> k) & 1).astype(jnp.uint32)
                        v = v + (rolled - v) * bit
                    acc = acc + v
                out_ref[:] = acc + h.astype(jnp.uint32)

            @jax.jit
            def run(l):
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[pl.BlockSpec((1, width), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((8, width), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n_tiles * 8, width), jnp.uint32),
                )(l)

            return run

        out = {}
        for n_bfly in (0, 2):
            run = make(n_bfly)
            jax.block_until_ready(run(lut))
            t0 = time.perf_counter()
            for _ in range(8):
                jax.block_until_ready(run(lut))
            out[n_bfly] = (time.perf_counter() - t0) / 8 * 1000.0
        return True, f"0bfly={out[0]:.2f}ms 2bfly={out[2]:.2f}ms marginal={(out[2]-out[0]):.2f}ms"

    check("timing_2bfly_1080p", timing)


if __name__ == "__main__":
    main()
