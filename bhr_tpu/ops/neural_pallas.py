"""Monolithic Pallas kernel for the neural surrogate (roadmap Phase 5).

One kernel renders the whole neural frame: in-kernel ray-gen -> reduced
features -> the MLP as MXU matmuls -> in-plane rotation -> analytic star
shading -> packed u32 pixels. Zero HBM intermediates: the staged XLA
path materializes the (N, 16) feature matrix and (N, width) activations
between fusions, which is most of its sustained-state frame time.

Layout strategy (the part Mosaic dictates): per grid step the kernel
owns a block of 8 x P pixels. All per-pixel math (ray-gen, features,
rotation, shading) runs on (8, P) planes — full vector-register
efficiency. The MXU wants pixels in the LANE dimension and features/
hidden channels in the sublane dimension, so the matmul chain runs once
per sublane row: a (16, P) feature matrix is assembled by sublane-concat
of 16 (1, P) slices (cheap — sublanes are the flexible axis), then

    h = tanh(W1^T (h1,16) @ F (16,P))   ... (h1,P)
    h = tanh(Wk^T @ h)                   ... hidden chain
    o = W4^T (8,h3) @ h                  ... (8,P): row 0 deflection
                                             coefficient, row 1 logit

with bf16 operands and fp32 accumulation — the same arithmetic XLA's
DEFAULT precision uses, so the committed weights stay on their trained
operating point (models/neural.py precision note). Per-row delta/logit
slices concat back to (8, P) planes and the epilogue proceeds at full
efficiency. Every shape here is compile-probed on the real v5e by
scripts/neural_kernel_probe.py.

Covers the analytic-star-field, passthrough-tonemap configuration (the
benchmark/headline shape); texture tiers keep the staged XLA path, whose
gather must run outside the kernel anyway (DESIGN.md section 3.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.camera import Camera

# params vector layout (fp32[24], SMEM)
_P_CAM = 0  # 3: camera position
_P_BH = 3  # 3: black hole position
_P_FWD = 6  # 3: camera forward
_P_RIGHT = 9  # 3: camera right
_P_UP = 12  # 3: camera up
_P_RS = 15  # schwarzschild radius
_P_FOVF = 16  # tan(fov / 2)
_P_WF = 17  # image width (fp32)
_P_HF = 18  # image height (fp32)
_P_ASPECT = 19  # width / height
_P_IDOFF = 20  # flat-pixel-id offset (row0 * width; band rendering)
_P_SPIN = 21  # Kerr spin a/M (0.0 for Schwarzschild nets; ignored there)
_PARAMS_LEN = 24

_BC_FACTOR = 2.598076211  # models/neural.py critical-impact normalizer

# Kerr surrogate feature matrices pad 22 -> 24 sublanes (zero rows; the
# first-layer weight pads matching zero columns, so the matmul is exact).
# Compile-probed on the v5e by scripts/neural_kernel_probe.py --kerr:
# raw 22 also lowers, but 24 keeps the sublane count 8-aligned.
KERR_FEAT_PAD = 2


def _model_of(params) -> str:
    """The weight shapes define the feature map: 16-in/2-out is the
    Schwarzschild net (models/neural.py), 22-in/3-out the Kerr net
    (models/neural_kerr.py)."""
    n_in = params[0][0].shape[0]
    n_out = params[-1][0].shape[1]
    if n_in == 16 and n_out == 2:
        return "schwarzschild"
    if n_in == 22 and n_out == 3:
        return "kerr"
    raise ValueError(
        f"unrecognized surrogate shape: in={n_in}, out={n_out} (expected "
        "16/2 Schwarzschild or 22/3 Kerr)"
    )


def prep_weights(params, dtype=jnp.bfloat16, feat_pad: int = 0):
    """MLP params -> kernel operand tuple.

    Per layer: W (in, out) -> W^T (out, in) in `dtype`; b -> (out, 1)
    fp32. The 2/3-wide head pads its out dim to 8 sublanes (rows past
    the real heads are zeros and ignored). `feat_pad` zero-pads the
    first layer's IN dim to match a zero-row-padded feature matrix
    (exact: zeros contribute exactly 0.0 to the accumulation).
    """
    out = []
    n = len(params)
    for i, (w, b) in enumerate(params):
        wt = jnp.asarray(w, jnp.float32).T
        bb = jnp.asarray(b, jnp.float32)[:, None]
        if i == 0 and feat_pad:
            wt = jnp.pad(wt, ((0, 0), (0, feat_pad)))
        if i == n - 1:
            pad = 8 - wt.shape[0]
            wt = jnp.pad(wt, ((0, pad), (0, 0)))
            bb = jnp.pad(bb, ((0, pad), (0, 0)))
        out.append(wt.astype(dtype))
        out.append(bb)
    return tuple(out)


def _pack_params(camera: Camera, scene, row0=0) -> jnp.ndarray:
    fov = jnp.asarray(scene.fov, jnp.float32)
    vals = [
        jnp.asarray(camera.position, jnp.float32),
        jnp.asarray(scene.black_hole_position, jnp.float32),
        jnp.asarray(camera.forward, jnp.float32),
        jnp.asarray(camera.right, jnp.float32),
        jnp.asarray(camera.up, jnp.float32),
        jnp.stack(
            [
                jnp.asarray(scene.schwarzschild_radius, jnp.float32),
                jnp.tan(fov * 0.5),
                jnp.float32(scene.screen_width),
                jnp.float32(scene.screen_height),
                jnp.float32(scene.screen_width) / jnp.float32(scene.screen_height),
                # fp32-exact for any frame below 2^24 pixels
                jnp.asarray(row0, jnp.float32) * jnp.float32(scene.screen_width),
                jnp.asarray(getattr(scene, "spin", 0.0), jnp.float32),
            ]
        ),
    ]
    flat = jnp.concatenate(vals)
    return jnp.pad(flat, (0, _PARAMS_LEN - flat.shape[0]))


def _build_kernel(n_layers: int, block_p: int, seed: int, dtype,
                  emit: str = "frame", model: str = "schwarzschild",
                  feat_pad: int = 0, precision=None):
    """Kernel closure for an MLP with n_layers (W, b) pairs.

    emit="frame": star-shaded packed-u32 pixels (the headline path).
    emit="dirs":  raw deflected direction planes + capture mask — the MXU
    front half for TEXTURE configs, whose gather epilogue must run at the
    XLA level anyway (DESIGN.md section 3.1): the kernel replaces the
    staged path's materialized (N, 16) features and (N, width) activations
    with four (H, W) output planes.

    model="kerr" assembles the 22-feature Kerr map + `feat_pad` zero rows
    (models/neural_kerr.ray_features_kerr; the spin block reads the
    per-frame camera-latitude scalar uy and the per-pixel w_hat/n_hat y
    components), reads THREE head rows (delta, chi = frame-dragging tilt,
    logit), applies the xi-shifted Kerr envelopes (kerr_envelopes — keep
    in sync BY HAND, CLAUDE.md), and rotates out of the ray plane by chi."""
    from .starfield import procedural_background

    def kernel(params, *refs):
        wb = refs[: 2 * n_layers]
        outs = refs[2 * n_layers:]
        g = pl.program_id(0)

        cam = (params[_P_CAM], params[_P_CAM + 1], params[_P_CAM + 2])
        bh = (params[_P_BH], params[_P_BH + 1], params[_P_BH + 2])
        fwd = (params[_P_FWD], params[_P_FWD + 1], params[_P_FWD + 2])
        right = (params[_P_RIGHT], params[_P_RIGHT + 1], params[_P_RIGHT + 2])
        up = (params[_P_UP], params[_P_UP + 1], params[_P_UP + 2])
        rs = params[_P_RS]
        fov_factor = params[_P_FOVF]
        wf = params[_P_WF]
        hf = params[_P_HF]
        aspect = params[_P_ASPECT]

        # flat pixel ids for this (8, P) block; fp32-exact below 2^24
        ridx = jax.lax.broadcasted_iota(jnp.int32, (8, block_p), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (8, block_p), 1)
        pid = ((g * 8 + ridx) * block_p + cidx).astype(jnp.float32) + params[
            _P_IDOFF
        ]
        yl = jnp.floor(pid * (1.0 / wf))
        xl = pid - yl * wf
        neg = (xl < 0.0).astype(jnp.float32)
        yl = yl - neg
        xl = xl + neg * wf
        ovr = (xl >= wf).astype(jnp.float32)
        yl = yl + ovr
        xl = xl - ovr * wf

        # ray-gen (mirrors core/camera.generate_rays exactly)
        u = (xl / wf - 0.5) * 2.0 * aspect
        v = (yl / hf - 0.5) * -2.0
        uf = u * fov_factor
        vf = v * fov_factor
        dx = fwd[0] + right[0] * uf + up[0] * vf
        dy = fwd[1] + right[1] * uf + up[1] * vf
        dz = fwd[2] + right[2] * uf + up[2] * vf
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv, dy * inv, dz * inv

        # plane basis: u_hat is a per-frame CONSTANT (camera - bh scalars)
        relx, rely, relz = cam[0] - bh[0], cam[1] - bh[1], cam[2] - bh[2]
        r0 = jnp.sqrt(relx * relx + rely * rely + relz * relz)
        ux, uy, uz = relx / r0, rely / r0, relz / r0
        c = dx * ux + dy * uy + dz * uz
        wx = dx - c * ux
        wy = dy - c * uy
        wz = dz - c * uz
        s_raw = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        s_inv = 1.0 / jnp.maximum(s_raw, 1e-12)
        whx, why, whz = wx * s_inv, wy * s_inv, wz * s_inv
        s = jnp.clip(s_raw, 0.0, 1.0)

        # features (models/neural.py ray_features, v2 map)
        ones = jnp.ones((8, block_p), jnp.float32)
        mu = (rs / r0) * ones
        q = jnp.clip(_BC_FACTOR * rs / (r0 * s + 1e-6), 0.0, 4.0)
        t = r0 * s / (_BC_FACTOR * rs) - 1.0
        f_log = 0.2 * jnp.log(jnp.abs(t) + 1e-3)
        f_sign = jnp.tanh(8.0 * t)
        s2 = 2.0 * s * c
        c2 = c * c - s * s
        s4 = 2.0 * s2 * c2
        c4 = c2 * c2 - s2 * s2
        s8 = 2.0 * s4 * c4
        c8 = c4 * c4 - s4 * s4
        s16 = 2.0 * s8 * c8
        c16 = c8 * c8 - s8 * s8
        feats = (
            mu, c, s, q, (0.25 * rs) * ones, (0.25 * jnp.log(r0)) * ones,
            f_log, f_sign, s2, c2, s4, c4, s8, c8, s16, c16,
        )
        if model == "kerr":
            # spin block (models/neural_kerr.ray_features_kerr): uy is a
            # per-frame scalar (camera latitude), w_hat/n_hat y-components
            # are per-pixel planes; n_hat = u_hat x w_hat
            spin = params[_P_SPIN]
            nyp = uz * whx - ux * whz
            xi = spin * nyp
            # mirrors models/neural_kerr.bc_factor_kerr (feature v2):
            # prograde-ness p = -xi (the axis mapping is orientation-
            # reversing), exact GR b_c via the sqrt-factored deg-6 fit,
            # and the static-frame redshift factor in the criticality
            # coordinate. Keep BIT-IDENTICAL to the model module — the
            # interpret parity test checks this.
            p_ = -xi
            h_ = 3.196512167 + p_ * (
                -0.406504577 + p_ * (
                    -0.102461550 + p_ * (
                        -0.006447487 + p_ * (
                            0.033141079 + p_ * (
                                -0.081345290 + p_ * (-0.090476836)
                            )
                        )
                    )
                )
            )
            bck = (
                2.0 + jnp.sqrt(jnp.maximum(1.0 + xi, 0.0)) * h_
            ) * 0.5
            red = jnp.sqrt(jnp.maximum(1.0 - rs / r0, 0.04))
            tk = r0 * s / (bck * rs * red) - 1.0
            f_log_k = 0.2 * jnp.log(jnp.abs(tk) + 1e-3)
            f_sign_k = jnp.tanh(8.0 * tk)
            feats = feats + (
                spin * ones, xi, (spin * uy) * ones, spin * why,
                f_log_k, f_sign_k,
            )
            if feat_pad:
                zero = jnp.zeros((8, block_p), jnp.float32)
                feats = feats + (zero,) * feat_pad

        # MLP chain per sublane row: pixels ride the lane dimension
        delta_rows = []
        chi_rows = []
        logit_rows = []
        logit_row = 2 if model == "kerr" else 1
        for r in range(8):
            f_r = jnp.concatenate(
                [f[r : r + 1, :] for f in feats], axis=0
            ).astype(dtype)  # (n_feats + feat_pad, P)
            h = f_r
            for li in range(n_layers):
                wt = wb[2 * li][:]
                bb = wb[2 * li + 1][:]
                o = (
                    jnp.dot(wt, h, precision=precision,
                            preferred_element_type=jnp.float32)
                    + bb
                )
                if li < n_layers - 1:
                    h = jnp.tanh(o).astype(dtype)
                else:
                    h = o  # (8, P) fp32 head rows: coeff(s), then logit
            delta_rows.append(h[0:1, :])
            if model == "kerr":
                chi_rows.append(h[1:2, :])
            logit_rows.append(h[logit_row : logit_row + 1, :])
        delta = jnp.concatenate(delta_rows, axis=0)  # (8, P)
        logit = jnp.concatenate(logit_rows, axis=0)

        # envelope parameterization (models/neural.py feature_version 3):
        # the head emits an O(1) coefficient; the fp32 analytic envelope
        # carries the deflection magnitude (the criticality coordinate is
        # already on registers: t for Schwarzschild, the xi-shifted tk for
        # Kerr — models/neural_kerr.kerr_envelopes).
        # The sigmoid gate restricts the critical-b log spike to inbound
        # rays — must match the model module exactly (tested in interpret
        # parity).
        t_env = tk if model == "kerr" else t
        spike = jnp.log1p(1.0 / (jnp.abs(t_env) + 2e-2)) * jax.nn.sigmoid(
            -8.0 * c
        )
        e_d = (rs / r0) * s * (0.25 + spike)
        delta = delta * e_d

        # in-plane rotation by delta (angle addition — no arctan2)
        cd = jnp.cos(delta)
        sd = jnp.sin(delta)
        cos_phi = c * cd - s * sd
        sin_phi = s * cd + c * sd
        if model == "kerr":
            # out-of-plane frame-dragging tilt chi
            # (models/neural_kerr.predict_directions_kerr)
            chi = jnp.concatenate(chi_rows, axis=0) * (
                e_d * (jnp.abs(spin) + 1e-3)
            )
            cc = jnp.cos(chi)
            sc_ = jnp.sin(chi)
            nxp = uy * whz - uz * why
            nzp = ux * why - uy * whx
            vx = (cc * cos_phi) * ux + (cc * sin_phi) * whx + sc_ * nxp
            vy = (cc * cos_phi) * uy + (cc * sin_phi) * why + sc_ * nyp
            vz = (cc * cos_phi) * uz + (cc * sin_phi) * whz + sc_ * nzp
        else:
            vx = cos_phi * ux + sin_phi * whx
            vy = cos_phi * uy + sin_phi * why
            vz = cos_phi * uz + sin_phi * whz
        vinv = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
        vx, vy, vz = vx * vinv, vy * vinv, vz * vinv

        if emit == "dirs":
            outs[0][:] = vx
            outs[1][:] = vy
            outs[2][:] = vz
            outs[3][:] = (logit > 0.0).astype(jnp.float32)
            return

        # analytic star shading + captured-black + pack (the monolithic
        # geodesic kernel's fast-tier epilogue, ops/pallas_trace.py)
        r_, g_, b_ = procedural_background(vx, vy, vz, seed=seed)
        live = (logit <= 0.0).astype(jnp.float32)

        def quant(chan):
            return (
                jnp.floor(jnp.clip(chan * live, 0.0, 1.0) * 255.0 + 0.5)
                .astype(jnp.int32)
                .astype(jnp.uint32)
            )

        outs[0][:] = (
            quant(r_)
            | (quant(g_) << 8)
            | (quant(b_) << 16)
            | jnp.uint32(0xFF000000)
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "block_p", "seed", "interpret",
                     "n_layers", "emit", "model", "feat_pad", "precision"),
)
def _render(packed_params, weight_ops, *, height, width, block_p, seed,
            interpret, n_layers, emit="frame", model="schwarzschild",
            feat_pad=0, precision=None):
    """`height` here is the number of OUTPUT rows (a band or the full
    frame); the full-image dims ride in packed_params for ray-gen."""
    n = height * width
    per_block = 8 * block_p
    grid = -(-n // per_block)
    # precision="highest": fp32 operands + multi-pass MXU dots — the
    # tier fp32-trained weights need (models/neural.mlp_apply precision
    # note). Mosaic compiles HIGHEST but not HIGH
    # (scripts/neural_precision_probe.py: rel err 1e-7 vs fp32 ref).
    op_dtype = jnp.float32 if precision else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None
    kernel = _build_kernel(n_layers, block_p, seed, op_dtype, emit=emit,
                           model=model, feat_pad=feat_pad, precision=prec)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for op in weight_ops:
        in_specs.append(
            pl.BlockSpec(
                op.shape,
                lambda g, nd=op.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
    block_spec = pl.BlockSpec(
        (8, block_p), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    padded = jax.ShapeDtypeStruct((grid * 8, block_p), jnp.uint32)
    padded_f = jax.ShapeDtypeStruct((grid * 8, block_p), jnp.float32)
    if emit == "dirs":
        out_specs = [block_spec] * 4
        out_shape = [padded_f] * 4
    else:
        out_specs = block_spec
        out_shape = padded
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(packed_params, *weight_ops)
    if emit == "dirs":
        return tuple(o.reshape(-1)[:n].reshape(height, width) for o in out)
    return out.reshape(-1)[:n].reshape(height, width)


def neural_render_packed(
    params,
    camera: Camera,
    scene,
    *,
    seed: int = 2020,
    block_p: int | None = None,
    interpret: bool = False,
    precision: str | None = None,
) -> jnp.ndarray:
    """Render one neural frame as a single fused kernel -> packed u32 (H, W).

    `params` are models/neural.py MLP weights. Analytic star field +
    passthrough tonemap only (the staged XLA path covers everything else).
    `block_p` = lanes per 8-row pixel block. Bigger blocks amortize the
    per-row matmul chain until activation VMEM pressure bites, so the
    default scales with the network width (v5e sweeps at 1080p:
    3x128 net 256/512/1024/2048/4096/8192 -> 5.57/3.10/2.02/1.79/1.75/
    2.11 ms, optimum 4096; 3x256 net 1024/2048/4096 -> 4.38/4.34/4.90,
    optimum 2048).
    """
    model = _model_of(params)
    feat_pad = KERR_FEAT_PAD if model == "kerr" else 0
    if block_p is None:
        widest = max(w.shape[1] for w, _ in params[:-1]) if len(params) > 1 else 128
        block_p = 4096 if widest <= 128 else 2048
    wdtype = jnp.float32 if precision else jnp.bfloat16
    weight_ops = prep_weights(params, dtype=wdtype, feat_pad=feat_pad)
    return _render(
        _pack_params(camera, scene),
        weight_ops,
        height=scene.screen_height,
        width=scene.screen_width,
        block_p=block_p,
        seed=seed,
        interpret=interpret,
        n_layers=len(params),
        model=model,
        feat_pad=feat_pad,
        precision=precision,
    )


def neural_trace_dirs(
    params,
    camera: Camera,
    scene,
    *,
    block_p: int | None = None,
    interpret: bool = False,
    precision: str | None = None,
):
    """Fused-kernel deflection field for TEXTURE configs -> TraceResult.

    Same MXU kernel as neural_render_packed but emitting raw direction
    planes + the capture mask instead of star-shaded pixels, so the
    texture tiers' gather epilogue (shade_image) consumes kernel-speed
    directions instead of the staged XLA path's materialized activations.
    final_pos is the broadcast camera origin (rays originate at the
    camera; the surrogate has no disk, so shading never reads a hit
    point)."""
    from .trace import STATUS_CAPTURED, STATUS_ESCAPED, TraceResult

    model = _model_of(params)
    feat_pad = KERR_FEAT_PAD if model == "kerr" else 0
    if block_p is None:
        widest = max(w.shape[1] for w, _ in params[:-1]) if len(params) > 1 else 128
        block_p = 4096 if widest <= 128 else 2048
    wdtype = jnp.float32 if precision else jnp.bfloat16
    weight_ops = prep_weights(params, dtype=wdtype, feat_pad=feat_pad)
    h, w = scene.screen_height, scene.screen_width
    vx, vy, vz, cap = _render(
        _pack_params(camera, scene),
        weight_ops,
        height=h,
        width=w,
        block_p=block_p,
        seed=0,
        interpret=interpret,
        n_layers=len(params),
        emit="dirs",
        model=model,
        feat_pad=feat_pad,
        precision=precision,
    )
    vel = jnp.stack([vx, vy, vz], axis=-1)
    status = jnp.where(
        cap > 0.0, jnp.int32(STATUS_CAPTURED), jnp.int32(STATUS_ESCAPED)
    )
    origins = jnp.broadcast_to(
        jnp.asarray(camera.position, jnp.float32), (h, w, 3)
    )
    steps = jnp.full((h, w), scene.max_steps, jnp.int32)
    return TraceResult(
        final_pos=origins, final_vel=vel, status=status, steps=steps
    )


def neural_render_packed_band(
    params,
    camera: Camera,
    scene,
    row0,
    band_h: int,
    *,
    seed: int = 2020,
    block_p: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Band flavor for mesh-sharded rendering: rows [row0, row0 + band_h)
    of the full frame as packed u32 (band_h, W). `row0` may be traced
    (shard_map axis_index); UVs always reference the full image dims."""
    model = _model_of(params)
    feat_pad = KERR_FEAT_PAD if model == "kerr" else 0
    if block_p is None:
        widest = max(w.shape[1] for w, _ in params[:-1]) if len(params) > 1 else 128
        block_p = 4096 if widest <= 128 else 2048
    weight_ops = prep_weights(params, feat_pad=feat_pad)
    return _render(
        _pack_params(camera, scene, row0=row0),
        weight_ops,
        height=band_h,
        width=scene.screen_width,
        block_p=block_p,
        seed=seed,
        interpret=interpret,
        n_layers=len(params),
        model=model,
        feat_pad=feat_pad,
    )
