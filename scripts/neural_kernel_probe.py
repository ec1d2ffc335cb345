#!/usr/bin/env python
"""Mosaic feasibility probes for the monolithic neural Pallas kernel.

Questions (each probed as a tiny pallas_call compiled on the REAL TPU —
interpret mode does not reproduce Mosaic lowering failures):
  1. in-kernel dot (H, 16) @ (16, P): does the MXU path accept K=16?
  2. building a (16, P) feature matrix by sublane-concat of 16 (1, P)
     slices taken from (8, P) planes
  3. tanh on (128, P) and the (8, 128) padded head matmul
  4. bf16 chain: bf16 operands with fp32 accumulation via
     preferred_element_type
Prints PASS/FAIL per probe with the Mosaic error when one fails.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


P = 512


def run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"PASS {name}: out={out.shape} {out.dtype} "
              f"finite={bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {msg}")
        return False


def probe_k16_dot():
    def kernel(w_ref, f_ref, o_ref):
        o_ref[:] = jnp.dot(
            w_ref[:], f_ref[:], preferred_element_type=jnp.float32
        )

    w = jnp.ones((128, 16), jnp.float32)
    f = jnp.ones((16, P), jnp.float32)
    return run(
        "k16_dot (128,16)@(16,P)",
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((128, P), jnp.float32)
        ),
        w,
        f,
    )


def probe_sublane_concat():
    def kernel(a_ref, o_ref):
        plane = a_ref[:]  # (8, P)
        rows = [plane[r : r + 1, :] * jnp.float32(r + 1) for r in range(8)]
        rows = rows + rows  # 16 (1, P) pieces
        o_ref[:] = jnp.concatenate(rows, axis=0)

    a = jnp.ones((8, P), jnp.float32)
    return run(
        "sublane_concat 16x(1,P)->(16,P)",
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((16, P), jnp.float32)
        ),
        a,
    )


def probe_hidden_chain():
    def kernel(w1_ref, w2_ref, f_ref, o_ref):
        h = jnp.tanh(
            jnp.dot(w1_ref[:], f_ref[:], preferred_element_type=jnp.float32)
        )
        h = jnp.tanh(
            jnp.dot(w2_ref[:], h, preferred_element_type=jnp.float32)
        )
        o_ref[:] = h

    w1 = jnp.ones((128, 16), jnp.float32) * 0.01
    w2 = jnp.ones((128, 128), jnp.float32) * 0.01
    f = jnp.ones((16, P), jnp.float32)
    return run(
        "hidden chain tanh((128,128)@tanh((128,16)@(16,P)))",
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((128, P), jnp.float32)
        ),
        w1,
        w2,
        f,
    )


def probe_head():
    def kernel(w_ref, h_ref, o_ref):
        o_ref[:] = jnp.dot(
            w_ref[:], h_ref[:], preferred_element_type=jnp.float32
        )

    w = jnp.ones((8, 128), jnp.float32)  # (2 real + 6 pad) head rows
    h = jnp.ones((128, P), jnp.float32)
    return run(
        "head (8,128)@(128,P)",
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, P), jnp.float32)
        ),
        w,
        h,
    )


def probe_bf16_chain():
    def kernel(w1_ref, w2_ref, f_ref, o_ref):
        h = jnp.dot(
            w1_ref[:], f_ref[:], preferred_element_type=jnp.bfloat16
        )
        h = jnp.tanh(h)
        h = jnp.dot(w2_ref[:], h, preferred_element_type=jnp.float32)
        o_ref[:] = h

    w1 = (jnp.ones((128, 16), jnp.float32) * 0.01).astype(jnp.bfloat16)
    w2 = (jnp.ones((128, 128), jnp.float32) * 0.01).astype(jnp.bfloat16)
    f = jnp.ones((16, P), jnp.bfloat16)
    return run(
        "bf16 chain (bf16 operands, bf16/fp32 accum)",
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((128, P), jnp.float32)
        ),
        w1,
        w2,
        f,
    )


def probe_kerr_dot(k):
    """Kerr feature matmul at K=22 (raw) / 24 (8-aligned) / 32
    (bf16-tile-aligned): which in-dims does Mosaic accept for the
    (256, K) @ (K, P) first layer?"""
    def kernel(w_ref, f_ref, o_ref):
        o_ref[:] = jnp.dot(
            w_ref[:], f_ref[:], preferred_element_type=jnp.float32
        )

    w = (jnp.ones((256, k), jnp.float32) * 0.01).astype(jnp.bfloat16)
    f = jnp.ones((k, P), jnp.bfloat16)
    return run(
        f"kerr_dot (256,{k})@({k},P) bf16",
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((256, P), jnp.float32)
        ),
        w,
        f,
    )


def probe_kerr_concat(n_rows):
    """n_rows-way sublane concat of (1, P) slices (the Kerr feature
    assembly: 22 features + optional zero-pad rows)."""
    def kernel(a_ref, o_ref):
        plane = a_ref[:]  # (8, P)
        rows = [
            plane[r % 8 : r % 8 + 1, :] * jnp.float32(r + 1)
            for r in range(n_rows)
        ]
        o_ref[:] = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)

    a = jnp.ones((8, P), jnp.float32)
    return run(
        f"kerr_concat {n_rows}x(1,P)->({n_rows},P) bf16",
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((n_rows, P), jnp.bfloat16)
        ),
        a,
    )


def probe_kerr_end_to_end():
    """The full Kerr kernel (ops/neural_pallas.py model='kerr') compiled
    and run at a small frame with the committed general net."""
    import pathlib

    from bhr_tpu.core.camera import Camera
    from bhr_tpu.core.scene import SceneParams
    from bhr_tpu.models import neural_kerr
    from bhr_tpu.ops.neural_pallas import (
        neural_render_packed, neural_trace_dirs,
    )

    asset = (
        pathlib.Path(__file__).resolve().parent.parent
        / "bhr_tpu" / "assets" / "neural_kerr.npz"
    )
    if not asset.exists():
        print("SKIP kerr_end_to_end: no committed Kerr asset")
        return True
    params, _ = neural_kerr.load_params(str(asset))
    scene = SceneParams(
        screen_width=128, screen_height=96, max_steps=500,
        spin=jnp.float32(0.9),
    )
    cam = Camera.default()
    ok = True
    for name, fn in (
        ("kerr kernel emit=frame 128x96",
         lambda: neural_render_packed(params, cam, scene)),
        ("kerr kernel emit=dirs 128x96",
         lambda: neural_trace_dirs(params, cam, scene).final_vel),
    ):
        try:
            out = fn()
            jax.block_until_ready(out)
            print(f"PASS {name}: out={out.shape} {out.dtype}")
        except Exception as e:
            print(f"FAIL {name}: {str(e).split(chr(10))[0][:200]}")
            ok = False
    return ok


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--kerr", action="store_true",
                    help="probe the Kerr kernel shapes (K=22/24/32 dots, "
                         "22/24-way concats, end-to-end kernel)")
    args = ap.parse_args()
    print("device:", jax.devices()[0])
    if args.kerr:
        results = [
            probe_kerr_dot(22),
            probe_kerr_dot(24),
            probe_kerr_dot(32),
            probe_kerr_concat(22),
            probe_kerr_concat(24),
            probe_kerr_end_to_end(),
        ]
    else:
        results = [
            probe_k16_dot(),
            probe_sublane_concat(),
            probe_hidden_chain(),
            probe_head(),
            probe_bf16_chain(),
        ]
    print("ALL PASS" if all(results) else "SOME FAILED")


if __name__ == "__main__":
    main()
