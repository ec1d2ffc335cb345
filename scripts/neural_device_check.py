#!/usr/bin/env python
"""On-device neural-kernel agreement check (a `make tpu-check` stage).

Interpret-mode parity (tests/test_neural.py) cannot reproduce Mosaic
compile bugs or the TPU's real matmul semantics, so this validates the
fused neural kernel ON THE CHIP against the staged XLA path at matching
matmul semantics (bf16 operands, fp32 accumulation):

  1. star-field config: monolithic kernel vs staged bf16 frame
  2. texture config: emit="dirs" kernel + gather epilogue vs staged
  3. the same two agreements for the KERR kernel flavor (22-feature
     map, 3-head, xi-shifted envelopes, out-of-plane chi rotation)
  4. every committed asset loads and renders finite frames end-to-end
     through its production path

Pass criteria mirror the interpret-parity tests: >= 99% exactly equal
pixels and <= 0.5% of pixels differing by more than 2 u8 (fp32
op-ordering residue under bf16 input rounding). Prints one JSON line per
config and exits nonzero on any failure.
"""

import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ASSETS = REPO / "bhr_tpu" / "assets"


def compare(tag, kernel_frame, staged_frame, exact_min=0.99, big_max=5e-3):
    k = np.asarray(kernel_frame).astype(np.int32)
    s = np.asarray(staged_frame).astype(np.int32)
    diff = np.abs(k - s).max(-1)
    rec = {
        "config": tag,
        "exact_frac": round(float((diff == 0).mean()), 5),
        "big_frac": round(float((diff > 2).mean()), 6),
        "max_diff": int(diff.max()),
    }
    rec["ok"] = rec["exact_frac"] >= exact_min and rec["big_frac"] <= big_max
    print(json.dumps(rec), flush=True)
    return rec["ok"]


def main():
    import jax.numpy as jnp

    from bhr_tpu.core.camera import Camera
    from bhr_tpu.core.scene import SceneParams
    from bhr_tpu.io.skybox import procedural_starfield
    from bhr_tpu.models import neural, neural_kerr
    from bhr_tpu.ops.neural_pallas import neural_render_packed
    from bhr_tpu.ops.sampling import pack_texture_rgba8, unpack_frame
    from bhr_tpu.ops.trace import TraceConfig
    from bhr_tpu.renderer import render_image

    ok = True
    cam = Camera.default()
    scene = SceneParams(screen_width=640, screen_height=360, max_steps=500)
    params, _ = neural.load_params(
        str(ASSETS / "neural_schwarzschild_orbit.npz")
    )

    # 1. star-field: monolithic kernel vs staged bf16
    kernel = unpack_frame(neural_render_packed(params, cam, scene))
    staged = render_image(
        cam, scene, None, None, None,
        config=TraceConfig(integrator="neural"), use_pallas=False,
        tile=(8, 128), fast_math=True, tonemap="passthrough",
        interpret=False, neural_params=params, neural_dtype="bfloat16",
    )
    ok &= compare("starfield_kernel_vs_staged", kernel, staged)

    # 2. texture: emit="dirs" kernel path vs fully staged (render_image
    # dispatches to neural_trace_dirs when a skybox is present)
    skybox = pack_texture_rgba8(procedural_starfield(512, 1024, seed=7))
    kern_tex = render_image(
        cam, scene, skybox, None, None,
        config=TraceConfig(integrator="neural"), use_pallas=True,
        tile=(8, 128), fast_math=True, tonemap="passthrough",
        interpret=False, neural_params=params, neural_dtype="float32",
        texture_filter="nearest",
    )
    staged_tex = render_image(
        cam, scene, skybox, None, None,
        config=TraceConfig(integrator="neural"), use_pallas=False,
        tile=(8, 128), fast_math=True, tonemap="passthrough",
        interpret=False, neural_params=params, neural_dtype="bfloat16",
        texture_filter="nearest",
    )
    ok &= compare("texture_dirs_vs_staged", kern_tex, staged_tex,
                  exact_min=0.97)

    # 3. Kerr kernel flavor: star + texture agreements on the chip
    kerr_asset = ASSETS / "neural_kerr_default.npz"
    if not kerr_asset.exists():
        kerr_asset = ASSETS / "neural_kerr.npz"
    kparams, _ = neural_kerr.load_params(str(kerr_asset))
    ksc = scene.replace(spin=jnp.float32(0.9))
    kernel_k = unpack_frame(neural_render_packed(kparams, cam, ksc))
    staged_k = render_image(
        cam, ksc, None, None, None,
        config=TraceConfig(integrator="neural", model="kerr"),
        use_pallas=False, tile=(8, 128), fast_math=True,
        tonemap="passthrough", interpret=False, neural_params=kparams,
        neural_dtype="bfloat16",
    )
    ok &= compare("kerr_starfield_kernel_vs_staged", kernel_k, staged_k)
    kern_tex_k = render_image(
        cam, ksc, skybox, None, None,
        config=TraceConfig(integrator="neural", model="kerr"),
        use_pallas=True, tile=(8, 128), fast_math=True,
        tonemap="passthrough", interpret=False, neural_params=kparams,
        neural_dtype="float32", texture_filter="nearest",
    )
    staged_tex_k = render_image(
        cam, ksc, skybox, None, None,
        config=TraceConfig(integrator="neural", model="kerr"),
        use_pallas=False, tile=(8, 128), fast_math=True,
        tonemap="passthrough", interpret=False, neural_params=kparams,
        neural_dtype="bfloat16", texture_filter="nearest",
    )
    ok &= compare("kerr_texture_dirs_vs_staged", kern_tex_k, staged_tex_k,
                  exact_min=0.97)

    # 4. every committed asset renders finite frames on-device
    for path in sorted(ASSETS.glob("*.npz")):
        if path.name.startswith("neural_kerr"):
            p, _ = neural_kerr.load_params(str(path))
            sc = scene.replace(spin=jnp.float32(0.9))
            frame = np.asarray(render_image(
                cam, sc, None, None, None,
                config=TraceConfig(integrator="neural", model="kerr"),
                use_pallas=True, tile=(8, 128), fast_math=True,
                tonemap="passthrough", interpret=False, neural_params=p,
            ))
        else:
            p, _ = neural.load_params(str(path))
            frame = np.asarray(
                unpack_frame(neural_render_packed(p, cam, scene))
            )
        good = frame.shape[:2] == (360, 640) and (frame[..., 3] == 255).all()
        print(json.dumps({"asset": path.name, "ok": bool(good)}), flush=True)
        ok &= good

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
