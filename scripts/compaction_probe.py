"""Escape-compaction probe for the exact-bilinear texture tier (round-4
VERDICT item 4).

The idea under test: only ESCAPED rays sample the skybox
(/root/reference/src/ray_tracer_euler.wgsl:154-156; captured rays are
black, wgsl:161-163), so gathering texture rows for only the escaped
subset — compact escaped pixel ids, row-gather those, scatter colors
back — should save the shadow fraction's gather cost.

What decides it on TPU (all prices measured here on the live chip, fused-
scan slopes, fresh inputs per timed call):

  * the escape fraction at the benchmark geometry (measured from the
    traced status plane, not assumed)
  * gather cost: ~c ns/index regardless of count pattern
    (scripts/gather_bench.py) — compaction saves (N - K) indices
  * compaction cost: building the compact id list is a cumsum (cheap,
    VPU) plus a SCATTER of N ids, and writing colors back is a SCATTER of
    K values — scatters price per index like gathers, so the machinery
    ADDS ~(N + K) index operations to save (N - K)

  net = c * [(N - K) * g_row - (N + K) * s] with K/N = escape fraction.
  For K/N ~ 0.8 the machinery costs ~4.5x what it saves even if a scatter
  were half a gather's price.

Prints one JSON line per measured component + a verdict line; archive the
output under measurements/round4/.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def slope(fn, make_input, n1=3, n2=12):
    """Per-call ms via the fused-scan slope protocol (fresh inputs)."""
    f = jax.jit(lambda xs: jax.lax.scan(lambda c, x: (c, fn(x)), 0, xs)[1])
    base = time.time_ns() % 1_000_000

    def fresh(n, k):
        return make_input(n, base + 7919 * k)

    jax.block_until_ready(f(fresh(n1, 0)))
    jax.block_until_ready(f(fresh(n2, 1)))
    t0 = time.perf_counter()
    jax.block_until_ready(f(fresh(n1, 2)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(f(fresh(n2, 3)))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1) * 1000.0


def main():
    from bhr_tpu import BlackHoleRenderer, Camera, SceneParams
    from bhr_tpu.core.camera import generate_rays
    from bhr_tpu.ops.pallas_trace import pallas_trace_image
    from bhr_tpu.ops.trace import STATUS_CAPTURED, STATUS_DISK, TraceConfig

    w, h, steps = 1920, 1080, 500
    n = w * h
    cam = Camera.new([15.0, 5.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    scene = SceneParams(screen_width=w, screen_height=h, max_steps=steps)

    # 1) the fraction of rays that sample the skybox at the benchmark
    #    geometry. NOT just STATUS_ESCAPED: at this config nothing reaches
    #    the r=100 escape sphere in 500 steps — rays that exhaust
    #    max_steps sample the texture with their final direction exactly
    #    like escaped ones (reference wgsl:169-170 falls through to the
    #    background sample; only captured/disk pixels skip it). The
    #    compaction capacity K must cover every sampling ray for ANY
    #    frame of the orbit; the orbit is radius-constant so one frame is
    #    representative.
    res = pallas_trace_image(cam, scene, TraceConfig(), fast_math=True)
    status = np.asarray(res.status)
    esc_frac = float(
        ((status != STATUS_CAPTURED) & (status != STATUS_DISK)).mean()
    )
    print(json.dumps({"probe": "sampling_fraction", "value": round(esc_frac, 4),
                      "config": "1080p_default_orbit"}), flush=True)

    k = int(n * esc_frac)
    kpad = int(n * min(1.0, esc_frac + 0.05))  # capacity with safety margin

    # 2) row-gather cost at N vs K scattered indices (the corner-rows
    #    table shape: (2049, 4096, 3) u32)
    table = jnp.arange(2049 * 4096 * 3, dtype=jnp.uint32).reshape(-1, 3)
    nrows = 2049 * 4096

    def row_gather(count):
        def fn(idx):
            return jnp.take(table, idx, axis=0).sum(axis=(0, 1))

        def make(nscan, seed):
            key = jax.random.PRNGKey(seed)
            return jax.random.randint(key, (nscan, count), 0, nrows,
                                      dtype=jnp.int32)

        return slope(fn, make)

    ms_gather_n = row_gather(n)
    ms_gather_k = row_gather(kpad)
    print(json.dumps({"probe": "row_gather_ms", "n_full": n,
                      "ms_full": round(ms_gather_n, 2), "k": kpad,
                      "ms_compacted": round(ms_gather_k, 2)}), flush=True)

    # 3) compaction machinery: cumsum (id assignment) + scatter of N ids
    #    into the compact list + scatter of K colors back into the frame
    def compact_ids(mask):
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        tgt = jnp.where(mask, pos, kpad)  # rejects park at a spill slot
        ids = jnp.zeros(kpad + 1, jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )
        return ids[:kpad]

    def make_mask(nscan, seed):
        key = jax.random.PRNGKey(seed)
        return jax.random.uniform(key, (nscan, n)) < esc_frac

    ms_compact = slope(lambda m: compact_ids(m).sum(), make_mask)

    def scatter_back(vals_ids):
        vals, ids = vals_ids
        return jnp.zeros(n, jnp.uint32).at[ids].set(vals, mode="drop").sum()

    def make_scatter(nscan, seed):
        key = jax.random.PRNGKey(seed)
        ids = jax.random.randint(key, (nscan, kpad), 0, n, dtype=jnp.int32)
        return (ids.astype(jnp.uint32), ids)

    ms_scatter = slope(scatter_back, make_scatter)
    print(json.dumps({"probe": "compaction_machinery_ms",
                      "cumsum_plus_id_scatter": round(ms_compact, 2),
                      "color_scatter_back": round(ms_scatter, 2)}), flush=True)

    saved = ms_gather_n - ms_gather_k
    added = ms_compact + ms_scatter
    print(json.dumps({
        "verdict": "compaction_" + ("wins" if saved > added else "loses"),
        "gather_ms_saved": round(saved, 2),
        "machinery_ms_added": round(added, 2),
        "net_ms": round(saved - added, 2),
        "note": "escape fraction measured on the benchmark scene; gathers "
                "and scatters both price per index on v5e, so removing the "
                "shadow fraction's indices cannot pay for N+K scatter "
                "indices unless the escape fraction is far below 1/6",
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
