#!/usr/bin/env python
"""Mosaic probe: do in-kernel MXU dots honor a multi-pass `precision`?

Round-5 context: fp32-trained surrogate weights (Kerr per-scene
distillation at --train-precision float32) need multi-pass matmuls at
inference (models/neural.mlp_apply precision note). The staged XLA path
takes precision=HIGH; this probe asks whether the fused Pallas kernel
can too — compiled on the REAL TPU (interpret mode does not reproduce
Mosaic lowering), then checked numerically: a multi-pass dot on inputs
with sub-bf16 mantissa structure must differ from the single-pass bf16
result and match the fp32 reference.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def kernel_for(precision):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    return kernel


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    # values exercising the low mantissa bits bf16 drops
    a = jnp.asarray(rng.standard_normal((128, 256)) * (1 + 1e-4), jnp.float32)
    b = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    ref = np.asarray(
        jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
    )

    outs = {}
    for name, prec in [
        ("default", None),
        ("high", jax.lax.Precision.HIGH),
        ("highest", jax.lax.Precision.HIGHEST),
    ]:
        try:
            out = pl.pallas_call(
                kernel_for(prec),
                out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
            )(a, b)
            out = np.asarray(jax.block_until_ready(out))
            err = float(np.abs(out - ref).max() / np.abs(ref).max())
            outs[name] = err
            print(f"PASS {name}: max rel err vs fp32 ref = {err:.3e}",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"FAIL {name}: {msg}", flush=True)

    if "default" in outs and "high" in outs:
        # a real multi-pass implementation must beat single-pass bf16 by
        # orders of magnitude; if equal, Mosaic silently ignored the arg
        honored = outs["high"] < outs["default"] / 50.0
        print(f"high_honored={honored} "
              f"(default {outs['default']:.2e} vs high {outs['high']:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
