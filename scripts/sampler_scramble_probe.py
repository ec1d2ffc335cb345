#!/usr/bin/env python
"""Probe 4: pick the production index-scramble for the corner-rows table.

sampler_coherence_probe established that k=3 row gathers price ~2x higher
for spatially COHERENT indices than scattered ones on v5e (44.8 vs 23.6
in one window; flat 1-word takes do not care — the round-2 gather_bench
"pattern-independent" finding was measured on flat takes only). A
pre-scrambled table + the same hash applied to the footprint index is a
bit-identical fix. Constraints on the hash:

  * must be bijective on [0, N), N = (H+1)*W (~2^23 for a 4K equirect);
  * must be computable in u32 WITHOUT overflow (no x64 on TPU) — the
    naive (f * 2654435761) % N wraps mod 2^32 first and is NOT injective;
  * must not pad the table past the ~134 MB big-table penalty threshold
    (docs/DESIGN.md section 3.1), which rules out the clean pow2-AND pad
    (100 MB -> 201 MB) unless the penalty turns out not to bite.

Candidates (bijectivity asserted on host before timing):
  g_smallA     f' = (f * 509) % N           — 509*N < 2^32: exact; scatter
               is an arithmetic progression (stride 509 rows = 6 KB)
  g_gridhash   x0' = (x0 * Ax) & (W-1); row' = (row * Ar) % (H+1);
               f' = row' * W + x0'          — full-strength row scatter,
               within-48KB column scatter; W must be a power of two
  g_2muls      f' = ((f * 509) % N * 499) % N — composition: effective
               multiplier ~2^18, two mods
  g_pow2pad    f' = (f * A) & (2^24 - 1) on a 201 MB padded table — the
               cheap-arithmetic option, testing whether the big-table
               penalty really eats the win
  g_coherent / g_scattered — controls (this window's bracket)

Prints one JSON line per variant (marginal ms per 1080p pass).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from bhr_tpu.ops import sampling

H, W = 1080, 1920
TH, TW = 2048, 4096
NROWS = TH + 1
N = NROWS * TW

A_SMALL = 509
A2_SMALL = 499
AX = 1357  # odd -> bijective mod 4096
AR = 1103515245 % NROWS  # full-strength row multiplier, gcd checked below
K24 = 1 << 24
A_POW2 = 2654435761  # odd


def _assert_bijective(fn, n):
    f = np.arange(n, dtype=np.uint64)
    out = fn(f)
    assert out.min() >= 0 and out.max() < n, (out.min(), out.max())
    seen = np.zeros(n, dtype=bool)
    seen[out] = True
    assert seen.all(), "not a bijection"


def check_hashes():
    import math

    assert math.gcd(A_SMALL, N) == 1
    assert math.gcd(A2_SMALL, N) == 1
    global AR
    while math.gcd(AR, NROWS) != 1:
        AR += 1
    _assert_bijective(lambda f: (f * A_SMALL) % N, N)
    _assert_bijective(lambda f: ((f * A_SMALL) % N * A2_SMALL) % N, N)

    def grid(f):
        row, x0 = f // TW, f % TW
        return ((row * AR) % NROWS) * TW + ((x0 * AX) % TW)

    _assert_bijective(grid, N)
    print(json.dumps({"hashes": "bijective", "AR": int(AR)}), flush=True)


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
    check_hashes()
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(
        key, (TH, TW), 0, 2**31 - 1, jnp.int32
    ).astype(jnp.uint32)
    cr_flat = sampling.corner_pack_texture_rows(packed).reshape(-1, 3)

    iarange = jnp.arange(N, dtype=jnp.uint32)

    def scatter_to(perm_u32):
        return jnp.zeros_like(cr_flat).at[perm_u32.astype(jnp.int32)].set(cr_flat)

    tbl_small = scatter_to((iarange * jnp.uint32(A_SMALL)) % jnp.uint32(N))
    tbl_2m = scatter_to(
        ((iarange * jnp.uint32(A_SMALL)) % jnp.uint32(N) * jnp.uint32(A2_SMALL))
        % jnp.uint32(N)
    )
    row_i = iarange // jnp.uint32(TW)
    x_i = iarange % jnp.uint32(TW)
    perm_grid = ((row_i * jnp.uint32(AR)) % jnp.uint32(NROWS)) * jnp.uint32(
        TW
    ) + ((x_i * jnp.uint32(AX)) & jnp.uint32(TW - 1))
    tbl_grid = scatter_to(perm_grid)
    tbl_pad = (
        jnp.zeros((K24, 3), cr_flat.dtype)
        .at[((iarange * jnp.uint32(A_POW2)) & jnp.uint32(K24 - 1)).astype(jnp.int32)]
        .set(cr_flat)
    )

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
        return row.astype(jnp.uint32), x0.astype(jnp.uint32)

    def flat_idx(s):
        row, x0 = foot_idx(s)
        return (row * jnp.uint32(TW) + x0).reshape(-1)

    def idx_cheap(s):
        return (
            (ii.astype(jnp.int32) * 977 + jj.astype(jnp.int32) * 331
             + (s * 1000.0).astype(jnp.int32))
            % N
        ).reshape(-1)

    variants = {
        "g_coherent": lambda s: jnp.take(
            cr_flat, flat_idx(s).astype(jnp.int32), axis=0
        ),
        "g_scattered": lambda s: jnp.take(cr_flat, idx_cheap(s), axis=0),
        "g_smallA": lambda s: jnp.take(
            tbl_small,
            ((flat_idx(s) * jnp.uint32(A_SMALL)) % jnp.uint32(N)).astype(
                jnp.int32
            ),
            axis=0,
        ),
        "g_gridhash": lambda s: jnp.take(
            tbl_grid,
            (
                ((foot_idx(s)[0] * jnp.uint32(AR)) % jnp.uint32(NROWS))
                * jnp.uint32(TW)
                + ((foot_idx(s)[1] * jnp.uint32(AX)) & jnp.uint32(TW - 1))
            ).reshape(-1).astype(jnp.int32),
            axis=0,
        ),
        "g_2muls": lambda s: jnp.take(
            tbl_2m,
            (
                (flat_idx(s) * jnp.uint32(A_SMALL)) % jnp.uint32(N)
                * jnp.uint32(A2_SMALL)
                % jnp.uint32(N)
            ).astype(jnp.int32),
            axis=0,
        ),
        "g_pow2pad": lambda s: jnp.take(
            tbl_pad,
            ((flat_idx(s) * jnp.uint32(A_POW2)) & jnp.uint32(K24 - 1)).astype(
                jnp.int32
            ),
            axis=0,
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
