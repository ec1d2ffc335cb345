#!/usr/bin/env python
"""Per-op on-device time decomposition of one frame program.

Renders a few frames of a named config under jax.profiler and prints the
top device ops by total duration — the tool for "where do this frame's
milliseconds actually go?" (e.g. multires low pass vs edge fix-up vs
sampling epilogue). Complements scripts/device_time.py, which validates
the per-frame TOTAL against the bench slope.

Usage: python scripts/profile_frame.py [config] [n_frames]
  config in {headline, headline_mr3, rk4disk, rk4disk_mr3, kerr4k,
  kerr4k_mr3, luma, luma_mr3, bilinear, bilinear_mr3, neural,
  neural_xl}; default headline.
"""

import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def device_op_totals(logdir):
    """{op_name: total_ms} over device-lane 'XLA Ops' events of the newest
    trace, plus the module-lane total."""
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return {}, 0.0
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower()
    }
    ops, module_ms = {}, 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        dur_ms = float(e.get("dur", 0.0)) / 1000.0
        if "XLA Modules" in tname:
            module_ms += dur_ms
        elif "XLA Ops" in tname:
            ops[e["name"]] = ops.get(e["name"], 0.0) + dur_ms
    return ops, module_ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "headline"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    from bhr_tpu import BlackHoleRenderer, SceneParams
    from bhr_tpu.core.camera import orbit_camera
    from bhr_tpu.io.skybox import procedural_starfield
    from bhr_tpu.utils.autotune import load_tuned, tuned_knobs
    from bhr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    base = {"fast_math": True}
    w, h, steps, skw = 1920, 1080, 500, {}
    mr = 0
    if which.startswith("rk4disk"):
        base.update(integrator="rk4", adaptive=True, disk=True)
    elif which.startswith("kerr4k"):
        w, h, steps = 3840, 2160, 2000
        base.update(model="kerr", disk=True)
        skw = {"spin": jnp.float32(0.9)}
    elif which.startswith("luma"):
        base.update(
            skybox=procedural_starfield(2048, 4096, seed=2020),
            texture_filter="luma",
        )
    elif which.startswith("bilinear"):
        base.update(
            skybox=procedural_starfield(2048, 4096, seed=2020),
            texture_filter="bilinear",
        )
    elif which.startswith("neural"):
        # Phase-5 surrogate decomposition: MLP matmuls vs shading epilogue
        asset = (
            "neural_schwarzschild_orbit_xl.npz"
            if which == "neural_xl"
            else "neural_schwarzschild_orbit.npz"
        )
        base.update(
            integrator="neural",
            neural_params=os.path.join(
                os.path.dirname(__file__), "..", "bhr_tpu", "assets", asset
            ),
        )
    if which.endswith("_mr3"):
        mr = 3

    from bhr_tpu.ops.trace import TraceConfig

    cfg = TraceConfig(
        integrator=base.pop("integrator", "euler"),
        adaptive=base.pop("adaptive", False),
        disk=base.pop("disk", False),
        model=base.pop("model", "schwarzschild"),
    )
    tuned = load_tuned(w, h, steps, fast_math=True, config=cfg)
    renderer = BlackHoleRenderer(
        w, h,
        integrator=cfg.integrator, adaptive=cfg.adaptive, disk=cfg.disk,
        model=cfg.model,
        tile=tuple(tuned["tile"]) if tuned else None,
        kernel_knobs=tuned_knobs(tuned) if tuned else None,
        **base,
    )
    scene = SceneParams(screen_width=w, screen_height=h, max_steps=steps, **skw)

    def frame(i):
        cam = orbit_camera(i / 60.0)
        if mr:
            return renderer.render_frame_multires(cam, scene, divisor=mr)
        return renderer.render_frame(cam, scene)

    out = frame(-1.0)  # compile + warm
    _ = jax.device_get(jnp.ravel(out)[0])

    logdir = tempfile.mkdtemp(prefix="bhr_prof_")
    jax.profiler.start_trace(logdir)
    for i in range(n_frames):
        out = frame(float(i))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    ops, module_ms = device_op_totals(logdir)
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:18]
    print(json.dumps({
        "config": which,
        "frames": n_frames,
        "module_ms_per_frame": round(module_ms / n_frames, 3),
        "top_ops_ms_per_frame": {
            k[:80]: round(v / n_frames, 3) for k, v in top
        },
        "logdir": logdir,
    }), flush=True)


if __name__ == "__main__":
    main()
