#!/usr/bin/env python
"""Round-3 probe: which IN-KERNEL dynamic-gather forms Mosaic lowers (v5e).

Round-2's pallas_gather_bench.py left ambiguity: take1d failed with "Only 2D
gather is supported" (implying SOME 2D form works), tal0 failed with an
empty error (tunnel hiccup?), and the roll butterfly probe had its own
negative-shift bug. This probe retries with full tracebacks and adds the
forms that matter for (a) an in-kernel blackbody LUT (512 entries) and
(b) an in-kernel texture sampler:

  tal0_<N>    — jnp.take_along_axis(tbl(N,128), idx(8,128), axis=0)
  take2d      — jnp.take(tbl(N,128), idx(8,128)) flat over a 2D table
  gather2d    — jax.lax.gather explicit 2D form
  roll_pos    — lane butterfly with POSITIVE shifts only
  two_stage   — sublane gather + lane butterfly = arbitrary (N*128)-entry
                table lookup, fully vectorized (duplicates allowed)
"""

import json
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_kernel(kernel, out_shape, inputs, **kw):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        **kw,
    )(*inputs)


def check(name, fn):
    try:
        ok, detail = fn()
        print(json.dumps({"variant": name, "ok": bool(ok), "detail": detail}), flush=True)
    except Exception as e:
        tb = traceback.format_exc()
        # last 400 chars usually carry the Mosaic error
        print(json.dumps({"variant": name, "ok": False,
                          "error": (repr(e)[:200] or "EMPTY"),
                          "tb_tail": tb[-400:]}), flush=True)


def main():
    rng = np.random.default_rng(7)

    for n in (8, 512, 2048):
        def tal0(n=n):
            tbl = jnp.asarray(rng.integers(0, 2**31, (n, 128), dtype=np.int32))
            idx = jnp.asarray(rng.integers(0, n, (8, 128), dtype=np.int32))

            def kernel(tbl_ref, idx_ref, out_ref):
                out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

            out = run_kernel(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32), [tbl, idx])
            want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=0)
            return np.array_equal(np.asarray(out), want), "exact"

        check(f"tal0_{n}", tal0)

    def take2d():
        tbl = jnp.asarray(rng.integers(0, 2**31, (512, 128), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, 512 * 128, (8, 128), dtype=np.int32))

        def kernel(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tbl_ref[:].reshape(-1), idx_ref[:])

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32), [tbl, idx])
        want = np.asarray(tbl).reshape(-1)[np.asarray(idx)]
        return np.array_equal(np.asarray(out), want), "exact"

    check("take2d", take2d)

    def roll_pos():
        x = jnp.asarray(rng.integers(0, 2**31, (8, 128), dtype=np.int32))
        tgt = jnp.asarray(rng.integers(0, 128, (8, 128), dtype=np.int32))

        def kernel(x_ref, tgt_ref, out_ref):
            lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            amt = (tgt_ref[:] - lanes) % 128
            v = x_ref[:]
            for k in range(7):
                # out[j] = v[(j + 2^k) % 128]  == roll right by 128 - 2^k
                rolled = pltpu.roll(v, 128 - (1 << k), 1)
                bit = (amt >> k) & 1
                v = v + (rolled - v) * bit
            out_ref[:] = v

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32), [x, tgt])
        want = np.take_along_axis(np.asarray(x), np.asarray(tgt), axis=1)
        return np.array_equal(np.asarray(out), want), "exact"

    check("roll_pos", roll_pos)

    def two_stage():
        """Arbitrary flat-table lookup, vectorized: flat idx -> (sub, lane);
        stage 1 take_along_axis per lane-column, stage 2 lane butterfly.
        Requires a per-output-lane choice of source lane — duplicates fine.
        Conflict-free only if, per output row, each SOURCE lane is asked for
        at most one sublane; here we gather one (8,128) block per needed
        (row-of-idx), so stage 1 uses idx's own lane column: correctness
        requires out[i,j]'s texel to live in lane l = flat % 128 — we route
        by gathering ALL 128 lanes' candidate then butterflying. Conflicts
        (two outputs in same row wanting same source lane, different
        sublanes) are resolved by doing stage 1 per OUTPUT lane j: lane j's
        column holds tbl[sub[i,j], j'] only for j' == j... so instead we
        precompute stage1[i, l] = tbl[sub_for_lane(i, l), l] where
        sub_for_lane is scatter-routed; true arbitrary gather needs 8
        rounds. Here: probe the FRIENDLY case (locality: all lanes of an
        output row share one sublane group) — texture rows are contiguous,
        so idx = base(i) + delta with delta < 128: stage 1 fetches two
        consecutive sublanes and the butterfly picks within them.
        """
        N = 2048
        tbl = jnp.asarray(rng.integers(0, 2**31, (N, 128), dtype=np.int32))
        base = rng.integers(0, N - 2, (8, 1), dtype=np.int32)
        delta = rng.integers(0, 256, (8, 128), dtype=np.int32)
        flat = base * 128 + delta  # spans two sublanes
        flat = jnp.asarray(flat)

        def kernel(tbl_ref, flat_ref, out_ref):
            f = flat_ref[:]
            sub = f // 128
            lane = f - sub * 128
            # stage 1: per-lane column fetch of the two candidate sublanes
            a = jnp.take_along_axis(tbl_ref[:], sub, axis=0)
            # stage 2: butterfly to the source lane
            lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            amt = (lane - lanes) % 128
            v = a
            for k in range(7):
                rolled = pltpu.roll(v, 128 - (1 << k), 1)
                bit = (amt >> k) & 1
                v = v + (rolled - v) * bit
            out_ref[:] = v

        out = run_kernel(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32), [tbl, flat])
        want = np.asarray(tbl).reshape(-1)[np.asarray(flat)]
        # stage 1 per-lane uses sub computed from THIS lane's own flat idx,
        # then the butterfly moves lane `lane[i,j]`'s value to lane j — but
        # lane `lane[i,j]` fetched sublane sub[i, lane[i,j]], not sub[i,j].
        # So this is only correct when sub is constant per row; report the
        # actual agreement fraction instead of a hard assert.
        got = np.asarray(out)
        frac = float((got == want).mean())
        return frac == 1.0, f"agreement={frac:.4f}"

    check("two_stage", two_stage)


if __name__ == "__main__":
    main()
