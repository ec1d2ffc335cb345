"""Root-cause probe for golden_diff's large-mismatch stragglers (round-4
VERDICT item 1: configs 4/5 have large mismatches 3-10 px from the nearest
KERNEL-status boundary).

For every large (> 16 u8) oracle-vs-kernel pixel diff it reports which
discrete-outcome divergence explains it:

  * status_flip  — oracle and kernel disagree on the termination status at
    that pixel (the trajectory itself crossed a fold between the two
    compiled programs; spatial distance to a same-program boundary is
    irrelevant for these)
  * near_boundary — within 2 px of a status boundary in EITHER program's
    status plane (1-ulp ray-gen differences move the boundary itself)
  * hit_branch   — both programs say DISK but the hit radii differ by more
    than one adaptive step's travel: the ray grazed y=0 and the two
    programs registered the crossing on different passes (the disk-rim /
    plane-tangency fold — invisible in the status plane)
  * unexplained  — none of the above (a true interior numerics bug)

Usage: python scripts/parity_probe.py [--config 4] [--fast-math]
Prints one JSON line per straggler + a summary line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from golden_diff import CONFIGS, LARGE_THRESH, boundary_distance_stats, status_boundary_mask


def chebyshev_dist_to(mask, pts, cap=64):
    """Chebyshev distance from each (y, x) in pts to the nearest True in
    mask (iterative dilation, capped)."""
    if not mask.any():
        return np.full(len(pts), cap)
    cur = mask.copy()
    dist = np.where(mask, 0, cap).astype(np.int32)
    for d in range(1, cap):
        if all(dist[y, x] < cap for y, x in pts):
            break
        r = cur.copy()
        r[:-1] |= cur[1:]
        r[1:] |= cur[:-1]
        n = r.copy()
        n[:, :-1] |= r[:, 1:]
        n[:, 1:] |= r[:, :-1]
        dist[n & ~cur] = d
        cur = n
    return np.array([dist[y, x] for y, x in pts])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=4)
    p.add_argument("--fast-math", action="store_true")
    args = p.parse_args()

    import jax.numpy as jnp

    from bhr_tpu import BlackHoleRenderer, Camera, SceneParams
    from bhr_tpu.core.camera import generate_rays
    from bhr_tpu.ops.pallas_trace import pallas_trace_image
    from bhr_tpu.ops.trace import trace_rays
    from bhr_tpu.utils.autotune import load_tuned, tuned_knobs

    name, w, h, steps, rkw, skw = CONFIGS[args.config]
    cam = Camera.new([15.0, 5.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    skw = {k: jnp.float32(v) for k, v in skw.items()}
    scene = SceneParams(screen_width=w, screen_height=h, max_steps=steps, **skw)

    oracle = BlackHoleRenderer(w, h, use_pallas=False, **rkw)
    oracle.render_frame(cam, scene)
    a = oracle.get_image_data().astype(np.int32)
    origins, dirs = generate_rays(cam, w, h, scene.fov)
    res_o = trace_rays(
        origins, dirs, scene.black_hole_position, scene.schwarzschild_radius,
        scene.spin, steps, oracle.config,
    )
    st_o = np.asarray(res_o.status)
    pos_o = np.asarray(res_o.final_pos)

    tuned = load_tuned(w, h, steps, fast_math=args.fast_math)
    tile = tuple(tuned["tile"]) if tuned else None
    knobs = tuned_knobs(tuned) if tuned else None
    kernel = BlackHoleRenderer(
        w, h, use_pallas=True, fast_math=args.fast_math, tile=tile,
        kernel_knobs=knobs, **rkw
    )
    kernel.render_frame(cam, scene)
    b = kernel.get_image_data().astype(np.int32)
    res_k = pallas_trace_image(
        cam, scene, kernel.config, tile=tile, fast_math=args.fast_math,
        track_steps=False,
    )
    st_k = np.asarray(res_k.status)
    pos_k = np.asarray(res_k.final_pos)

    diff = np.abs(a - b)[..., :3].max(axis=-1)
    large = diff > LARGE_THRESH
    pts = [tuple(p) for p in np.argwhere(large)]
    print(json.dumps({"config": name, "n_large": len(pts)}), flush=True)
    if not pts:
        return 0

    bmask_k = status_boundary_mask(st_k)
    bmask_o = status_boundary_mask(st_o)
    d_k = chebyshev_dist_to(bmask_k, pts)
    d_o = chebyshev_dist_to(bmask_o, pts)

    rs = float(np.asarray(scene.schwarzschild_radius))
    summary = {"status_flip": 0, "near_boundary": 0, "hit_branch": 0,
               "unexplained": 0}
    for i, (y, x) in enumerate(pts):
        so, sk = int(st_o[y, x]), int(st_k[y, x])
        ro = float(np.hypot(pos_o[y, x, 0], pos_o[y, x, 2]))
        rk = float(np.hypot(pos_k[y, x, 0], pos_k[y, x, 2]))
        # one adaptive step's max travel: dt_max = dt * 1.0, |v| = 1
        step_travel = float(oracle.config.dt)
        if so != sk:
            kind = "status_flip"
        elif d_k[i] <= 2 or d_o[i] <= 2:
            kind = "near_boundary"
        elif so == 3 and abs(ro - rk) > step_travel:
            kind = "hit_branch"
        else:
            kind = "unexplained"
        summary[kind] += 1
        print(json.dumps({
            "px": [int(y), int(x)], "diff_u8": int(diff[y, x]),
            "status_oracle": so, "status_kernel": sk,
            "d_boundary_kernel": int(d_k[i]), "d_boundary_oracle": int(d_o[i]),
            "hit_r_oracle": round(ro, 4), "hit_r_kernel": round(rk, 4),
            "kind": kind,
        }), flush=True)
    print(json.dumps({"config": name, "summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
