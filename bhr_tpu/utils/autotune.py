"""On-device kernel autotuning.

pick_tile() encodes v5e measurements; other TPU generations (or future
compiler versions) may prefer different tile widths / loop structures. The
autotuner measures a candidate grid on the actual device using the
fused-scan slope protocol (two scan lengths, fresh frame times per timed
call — the only timing method that survives this environment's dispatch
overhead and result caching; see docs/DESIGN.md) and caches the winner per
(device kind, width, height, max_steps, fast_math) in a JSON sidecar.

Search axes (ops/pallas_trace.py build_kernel):
  tile              — (8, W) kernel tile width
  early_exit_every  — all-done check cadence (0 = fixed-trip loop)
  steps_per_check   — self-gated steps inlined per loop trip (pure
                      restructuring; results identical at any setting)
  unroll            — inner fori_loop unroll factor

The search is staged (tiles first, then loop knobs on the winning tile) to
keep compile count manageable: ~16 candidates instead of the full product.

Usage:
    from bhr_tpu.utils.autotune import autotune
    best = autotune(1920, 1080, 500)  # {'tile': [8, 640], 'early_exit_every': ..,
                                      #  'steps_per_check': .., 'unroll': ..}
    renderer = BlackHoleRenderer(
        1920, 1080, fast_math=True, tile=tuple(best["tile"]),
        kernel_knobs=(best["early_exit_every"], best["unroll"],
                      best["steps_per_check"]),
    )
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import jax.numpy as jnp

from ..ops.pallas_trace import DEFAULT_EARLY_EXIT_EVERY, pick_tile

logger = logging.getLogger("bhr_tpu")

DEFAULT_CACHE = ".bhr_autotune.json"


def _normalize(cand: dict) -> dict:
    return {
        "tile": list(cand["tile"]),
        "early_exit_every": cand.get("early_exit_every", DEFAULT_EARLY_EXIT_EVERY),
        "steps_per_check": cand.get("steps_per_check", 1),
        "unroll": cand.get("unroll", 1),
        "linear": bool(cand.get("linear", False)),
    }


def _tile_candidates(width: int):
    tiles = [(8, tw) for tw in (256, 384, 512, 640) if tw <= max(width, 256)]
    # taller tiles amortize per-tile setup/grid overhead (results identical
    # — the kernel is tile-shape-agnostic); probe them at the widths that
    # win for (8, *)
    tiles += [(16, tw) for tw in (512, 640) if tw <= max(width, 256)]
    return [{"tile": t, "early_exit_every": DEFAULT_EARLY_EXIT_EVERY} for t in tiles]


def _knob_candidates(tile, max_steps: int, width: int = 0,
                     scratch_only: bool = False):
    """Loop-structure variants on a fixed tile.

    `scratch_only`: the config routes to the scratch-status kernel
    (plugin physics / kerr_lt exact — ops/pallas_trace._use_stateless),
    where turbo sub-stepping and flat-id ray-gen are stateless-flavor
    features that silently alias to spc=1 / linear=False. Emitting those
    variants would burn one remote compile + slope pair each (~40 s over
    the tunnel) measuring the identical program, so the search collapses
    to the axes the scratch kernel actually has: early_exit_every.
    """
    cands = []
    # flat-id ray-gen pays when 2-D tiling pads the width
    linears = (False, True) if (width % tile[1] and not scratch_only) else (False,)
    # early-exit cadences: off, the default, plus divisors of max_steps so
    # the turbo axis stays combinable (e.g. 500 % 64 != 0 locks the
    # default cadence to spc=1 — disk/kerr configs, where rays DO
    # terminate early, need a dividing cadence to explore eee x spc)
    eees = [0, DEFAULT_EARLY_EXIT_EVERY]
    for e in (25, 50, 100):
        if max_steps % e == 0 and e not in eees:
            eees.append(e)
    spcs = (1,) if scratch_only else (1, 2, 4, 5, 10, 20, 25, 50)
    for eee in eees:
        for spc in spcs:
            if spc > 1 and max_steps % spc:
                continue
            if spc > 1 and eee and (eee % spc or max_steps % eee):
                continue
            # Mosaic fori_loop only supports unroll=1 or full-trip unroll;
            # full unroll of a 64-step inner loop explodes code size, so
            # the unroll axis stays at 1 (kept in the schema for other
            # backends/generations)
            for unroll in (1,):
                for linear in linears:
                    cands.append({
                        "tile": tile,
                        "early_exit_every": eee,
                        "steps_per_check": spc,
                        "unroll": unroll,
                        "linear": linear,
                    })
    return cands


def _measure_candidate(width, height, max_steps, cand, n1=2, n2=8,
                       fast_math=True, config=None, spin=0.9):
    """Slope ms/frame for one candidate config on the current device.

    Returns a non-positive number when dispatch-time noise swamps the
    measurement (short scan slower than long scan); callers must discard
    such samples. `config` (a TraceConfig) selects the physics being
    tuned; the measured program is the SHIPPED one — renderer.render_image
    with this exact kernel configuration (monolithic where eligible,
    staged epilogue otherwise).
    """
    from ..core.camera import orbit_camera
    from ..core.scene import SceneParams
    from ..ops.trace import TraceConfig

    if config is None:
        config = TraceConfig()
    cand = _normalize(cand)
    scene = SceneParams(
        screen_width=width, screen_height=height, max_steps=max_steps,
        spin=jnp.float32(spin if config.model.startswith("kerr") else 0.0),
    )
    from ..models.disk import DiskParams, blackbody_lut
    from ..renderer import render_image

    disk_params = (
        DiskParams.for_scene(scene.schwarzschild_radius) if config.disk else None
    )
    lut = blackbody_lut() if config.disk else None

    def one(c, t):
        out = render_image(
            orbit_camera(t),
            scene,
            None,
            disk_params,
            lut,
            config=config,
            use_pallas=True,
            tile=tuple(cand["tile"]),
            fast_math=fast_math,
            tonemap="passthrough",
            interpret=False,
            packed=True,
            kernel_knobs=(
                cand["early_exit_every"], cand["unroll"],
                cand["steps_per_check"], int(cand["linear"]),
            ),
        )
        return c, out

    f = jax.jit(lambda ts: jax.lax.scan(one, 0, ts)[1])
    base = time.time() % 100000.0

    def fresh(n, k):
        return jnp.arange(n, dtype=jnp.float32) / 60.0 + jnp.float32(base + 97.0 * k)

    jax.block_until_ready(f(fresh(n1, 0)))
    jax.block_until_ready(f(fresh(n2, 1)))
    t0 = time.perf_counter()
    jax.block_until_ready(f(fresh(n1, 2)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(f(fresh(n2, 3)))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1) * 1000.0


def _search(cands, measure, best=None):
    for cand in cands:
        try:
            ms = measure(cand)
        except Exception as e:  # a candidate failing to compile is not fatal
            logger.warning("autotune candidate %s failed: %s", cand, e)
            continue
        if ms <= 0.0:  # dispatch-noise-corrupted slope: unusable sample
            logger.warning("autotune candidate %s: noisy slope %.2f, skipped", cand, ms)
            continue
        logger.info("autotune %s: %.2f ms/frame", cand, ms)
        print(f"  autotune {cand}: {ms:.2f} ms/frame", flush=True)
        if best is None or ms < best["ms_per_frame"]:
            best = {**_normalize(cand), "ms_per_frame": round(ms, 3)}
    return best


def _config_key_suffix(config) -> str:
    """Cache-key suffix for non-default physics configs (empty for the
    default TraceConfig, keeping round-2 cache entries valid)."""
    if config is None:
        return ""
    parts = []
    if config.model != "schwarzschild":
        parts.append(config.model)
    if config.integrator != "euler":
        parts.append(config.integrator)
    if config.adaptive:
        parts.append("adaptive")
    if config.disk:
        parts.append("disk")
    return ("|" + "+".join(parts)) if parts else ""


def autotune(
    width: int,
    height: int,
    max_steps: int = 500,
    *,
    fast_math: bool = True,
    config=None,
    candidates=None,
    cache_path: str = DEFAULT_CACHE,
    force: bool = False,
    measure_fn=_measure_candidate,
) -> dict:
    """Return the best tile + loop-knob config for this device and shape.

    Off-TPU (CPU/interpret) measurement is meaningless — returns the static
    pick_tile() defaults immediately. Results are cached in `cache_path`.
    `config` tunes a non-default physics configuration (rk4/adaptive/disk/
    kerr) — keyed separately in the cache.
    """
    device_kind = jax.devices()[0].device_kind
    key = (
        f"{device_kind}|{width}x{height}|steps={max_steps}|fast={fast_math}"
        + _config_key_suffix(config)
    )
    cache = {}
    if os.path.exists(cache_path):
        try:
            cache = json.load(open(cache_path))
        except (OSError, json.JSONDecodeError):
            cache = {}
    if not force and key in cache:
        return cache[key]

    default = _normalize({"tile": list(pick_tile(width))})
    default["ms_per_frame"] = None
    if jax.default_backend() != "tpu" and measure_fn is _measure_candidate:
        return default

    def measure(cand):
        if measure_fn is _measure_candidate:
            return measure_fn(width, height, max_steps, cand,
                              fast_math=fast_math, config=config)
        return measure_fn(width, height, max_steps, cand)

    from ..ops.pallas_trace import _use_stateless

    scratch_only = config is not None and not _use_stateless(
        config, False, fast_math
    )

    if candidates is not None:
        best = _search(candidates, measure)
    else:
        # stage 1: tile sweep at default loop structure
        best = _search(_tile_candidates(width), measure)
        # stage 2: loop knobs on the winning tile
        if best is not None:
            best = _search(
                _knob_candidates(tuple(best["tile"]), max_steps, width,
                                 scratch_only=scratch_only),
                measure, best,
            )
        # stage 3: the winning loop structure back across the other tiles —
        # tile and loop knobs interact (measured on v5e: (8, 640) wins at
        # spc=1 but (8, 512) wins at spc=20, 10.3 -> 9.9 ms at 1080p), so a
        # purely staged search can strand the winner on the wrong tile
        if best is not None:
            retries = []
            for t in _tile_candidates(width):
                if list(t["tile"]) == list(best["tile"]):
                    continue
                # linear ray-gen's payoff is a per-tile property (it kills
                # width-padding waste), so re-explore it per retried tile
                # rather than pinning the stage-2 winner's setting
                lin_opts = {False} if scratch_only else {
                    False, bool(width % t["tile"][1])
                }
                for lin in sorted(lin_opts):
                    retries.append(
                        {**best, "tile": list(t["tile"]), "linear": lin}
                    )
            best = _search(retries, measure, best)
    result = best or default
    cache[key] = result
    try:
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass
    return result


def tuned_knobs(tuned: dict) -> tuple:
    """Cache entry -> the renderer's kernel_knobs tuple
    (early_exit_every, unroll, steps_per_check, linear)."""
    n = _normalize({"tile": tuned.get("tile", [8, 640]), **tuned})
    return (
        n["early_exit_every"], n["unroll"], n["steps_per_check"],
        int(n["linear"]),
    )


def load_tuned(width, height, max_steps, fast_math=True, config=None,
               cache_path=DEFAULT_CACHE):
    """Cached tuning result for this device/shape, or None (never measures)."""
    try:
        cache = json.load(open(cache_path))
    except (OSError, json.JSONDecodeError):
        return None
    key = (
        f"{jax.devices()[0].device_kind}|{width}x{height}|"
        f"steps={max_steps}|fast={fast_math}" + _config_key_suffix(config)
    )
    return cache.get(key)
