#!/usr/bin/env python
"""Hardware smoke test: compile + run every kernel configuration on the
real TPU and sanity-check outputs against the XLA oracle.

The CPU test suite runs Pallas in interpreter mode, which does NOT
reproduce Mosaic compile bugs (see CLAUDE.md); this script is the
hardware-side complement. Run it after any kernel change:

    python scripts/tpu_smoke.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()}, need tpu")
        return 0

    from bhr_tpu import Camera, SceneParams
    from bhr_tpu.core.camera import generate_rays
    from bhr_tpu.ops.pallas_trace import pallas_render_packed, pallas_trace_image
    from bhr_tpu.ops.trace import TraceConfig, trace_rays

    cam = Camera.new([0.0, 2.0, 30.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    failures = 0

    def check(name, ok, detail=""):
        nonlocal failures
        print(f"{'OK  ' if ok else 'FAIL'} {name} {detail}", flush=True)
        if not ok:
            failures += 1

    configs = [
        ("euler", TraceConfig(), {}),
        ("rk4", TraceConfig(integrator="rk4"), {}),
        ("adaptive", TraceConfig(adaptive=True), {}),
        ("kerr", TraceConfig(model="kerr"), dict(spin=jnp.float32(0.9))),
        ("kerr_lt", TraceConfig(model="kerr_lt"), dict(spin=jnp.float32(0.9))),
        ("disk", TraceConfig(disk=True), {}),
        ("kerr+rk4+disk", TraceConfig(model="kerr", integrator="rk4", disk=True),
         dict(spin=jnp.float32(0.9))),
    ]
    for name, cfg, scene_kw in configs:
        scene = SceneParams(screen_width=96, screen_height=48, max_steps=300, **scene_kw)
        for fast in (False, True):
            label = f"{name} fast={fast}"
            try:
                t0 = time.time()
                res = pallas_trace_image(cam, scene, cfg, interpret=False, fast_math=fast)
                jax.block_until_ready(res.status)
                o, d = generate_rays(cam, 96, 48, scene.fov)
                ref = trace_rays(
                    o, d, scene.black_hole_position, scene.schwarzschild_radius,
                    scene.spin, scene.max_steps, cfg,
                )
                agree = (np.asarray(res.status) == np.asarray(ref.status)).mean()
                check(label, agree >= 0.98,
                      f"status agreement {agree:.4f} ({time.time()-t0:.0f}s)")
            except Exception as e:
                check(label, False, str(e)[:120])

    # exact stateless kernel (the BHR_BENCH_FAST=0 perf path: dt-freeze,
    # IEEE ops, no status scratch) vs the scratch-status exact kernel
    for cfg, label in ((TraceConfig(), "stateless-exact euler"),
                       (TraceConfig(integrator="rk4"), "stateless-exact rk4"),
                       (TraceConfig(adaptive=True), "stateless-exact adaptive")):
        try:
            scene = SceneParams(screen_width=96, screen_height=48, max_steps=300)
            a = pallas_trace_image(cam, scene, cfg, interpret=False)
            b = pallas_trace_image(cam, scene, cfg, interpret=False,
                                   fast_math=False, track_steps=False)
            eq = (np.asarray(a.status) == np.asarray(b.status)).all()
            m = np.asarray(a.status) != 2
            veq = (np.asarray(a.final_vel)[m] == np.asarray(b.final_vel)[m]).mean()
            check(label, bool(eq) and veq >= 0.999,
                  f"status_eq={bool(eq)} vel_biteq={veq:.5f}")
        except Exception as e:
            check(label, False, str(e)[:120])

    # turbo / unroll loop-structure variants (autotuner search space)
    for eee, unroll, spc in ((0, 1, 1), (0, 1, 2), (60, 1, 2)):
        label = f"knobs eee={eee} unroll={unroll} spc={spc}"
        try:
            scene = SceneParams(screen_width=96, screen_height=48, max_steps=300)
            frame = pallas_render_packed(
                cam, scene, TraceConfig(), interpret=False,
                early_exit_every=eee, unroll=unroll, steps_per_check=spc,
            )
            jax.block_until_ready(frame)
            check(label, np.asarray(frame).any())
        except Exception as e:
            check(label, False, str(e)[:120])

    # texture skybox tiers end-to-end through the renderer
    try:
        from bhr_tpu import BlackHoleRenderer
        from bhr_tpu.io.skybox import procedural_starfield

        sky = procedural_starfield(256, 512, seed=3)
        frames = {}
        for mode in ("bilinear", "nearest", "luma"):
            r = BlackHoleRenderer(96, 48, skybox=sky, texture_filter=mode,
                                  fast_math=True)
            scene = SceneParams(screen_width=96, screen_height=48, max_steps=300)
            frames[mode] = np.asarray(r.render_frame(cam, scene)).astype(int)
        d_near = np.abs(frames["bilinear"] - frames["nearest"])[..., :3].mean()
        d_luma = np.abs(frames["bilinear"] - frames["luma"])[..., :3].mean()
        check("texture tiers", d_luma <= d_near + 1.0,
              f"mean|bilinear-luma|={d_luma:.2f} mean|bilinear-nearest|={d_near:.2f}")
    except Exception as e:
        check("texture tiers", False, str(e)[:120])

    # monolithic trace+shade kernel
    try:
        scene = SceneParams(screen_width=96, screen_height=48, max_steps=300)
        frame = pallas_render_packed(cam, scene, TraceConfig(), interpret=False)
        jax.block_until_ready(frame)
        arr = np.asarray(frame).view(np.uint8).reshape(48, 96, 4)
        check("monolithic", arr[..., 3].min() == 255 and arr[..., :3].max() > 0,
              f"mean {arr[..., :3].mean():.1f}")
    except Exception as e:
        check("monolithic", False, str(e)[:120])

    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
