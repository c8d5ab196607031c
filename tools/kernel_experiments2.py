"""Second experiment batch: shaving the residual VPU passes in the int8
attention kernel (24.6 ms vs ~15 ms roofline at B=256).

Variants (all on the no-max clamped softmax base):
  V1 denom-fold: p left unnormalized through p@v, one (S,D) post-scale by
     1/rowsum instead of the (S,S) divide. Clamp tightened to 70 so the
     unnormalized f32 accumulation cannot overflow (197·e^70·|v| < 2e33).
  V2 exp2: scale·log2(e) folded into q before the QK dot; exp2 instead of
     exp (additive 0/-inf masks are fixed points of the rescale).
  V3 = V1 + V2.
  V4 tile-scalar activation quant: one amax over the whole (G·S, W) tile
     instead of per-row; scalar scale folds into the weight-scale multiply
     (one fewer (G·S, 3W) pass). Accuracy must be re-gated if adopted.

    python tools/kernel_experiments2.py [iters] [inner]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG2E = 1.4426950408889634


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.ops.quant import (
        _row_quant, int8_ln_qkv_attention, quantize_model, quantize_weight,
    )

    config = VIT_B_16
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16
    H = config.vision.heads
    W = config.vision.width
    SEQ = (224 // config.patch_size) ** 2 + 1

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    params = quantize_model(params)
    v = params["visual"]
    rng = np.random.default_rng(0)

    def make_kernel(variant):
        def kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                   wo_ref, so_ref, bo_ref, o_ref, *, heads, dim, scale, eps):
            width = heads * dim
            group, seq, _ = x_ref.shape
            x = x_ref[:].reshape(group * seq, width)
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            h = (xf - mean) * jax.lax.rsqrt(var + eps)
            h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
            if variant == "v4":
                amax = jnp.max(jnp.abs(h))
                hscale = jnp.maximum(amax, 1e-6) / 127.0
                hq = jnp.clip(jnp.round(h * (1.0 / hscale)), -127, 127).astype(jnp.int8)
            else:
                hq, hscale = _row_quant(h)
            acc = jax.lax.dot_general(
                hq, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32, precision=jax.lax.Precision.DEFAULT)
            if variant == "v4":
                qkv = (acc.astype(jnp.float32) * (hscale * sqkv_ref[:])
                       + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)
            else:
                qkv = (acc.astype(jnp.float32) * hscale * sqkv_ref[:]
                       + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)

            use_exp2 = variant in ("v2", "v3")
            fold_denom = variant in ("v1", "v3")
            clamp = 70.0 if fold_denom else 80.0
            if use_exp2:
                clamp *= LOG2E

            attns = []
            for g in range(group):
                tile = qkv[g * seq:(g + 1) * seq]
                outs = []
                for hd in range(heads):
                    q = tile[:, hd * dim:(hd + 1) * dim]
                    k = tile[:, width + hd * dim: width + (hd + 1) * dim]
                    vv = tile[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                    if use_exp2:
                        q = q * jnp.asarray(scale * LOG2E, q.dtype)
                        s = jax.lax.dot_general(
                            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                        p = jnp.exp2(jnp.minimum(s, clamp))
                    else:
                        s = jax.lax.dot_general(
                            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT) * scale
                        p = jnp.exp(jnp.minimum(s, clamp))
                    if fold_denom:
                        denom = jnp.sum(p, axis=-1, keepdims=True)
                        o = jax.lax.dot_general(
                            p.astype(vv.dtype), vv,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                        outs.append(o * (1.0 / denom))
                    else:
                        p = p / jnp.sum(p, axis=-1, keepdims=True)
                        outs.append(jax.lax.dot_general(
                            p.astype(vv.dtype), vv,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT))
                attns.append(jnp.concatenate(outs, axis=-1))
            attn = jnp.concatenate(attns, axis=0)
            aq, ascale = _row_quant(attn)
            acc2 = jax.lax.dot_general(
                aq, wo_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32, precision=jax.lax.Precision.DEFAULT)
            out = acc2.astype(jnp.float32) * ascale * so_ref[:] + bo_ref[:].astype(jnp.float32)
            o_ref[:] = (xf + out).astype(o_ref.dtype).reshape(group, seq, width)
        return kernel

    def attn_var(x, p, variant):
        bsz, seq, width = x.shape
        dim = width // H
        group = 2
        q = p["attn_q"]
        # historical variants keep the int8 out-projection; prod no longer
        # carries wo_q/so (out proj is bf16 now), so quantize inline
        wo_q, so = quantize_weight(p["attn"]["wo"])
        args = (x, p["ln1"]["scale"].reshape(1, width), p["ln1"]["bias"].reshape(1, width),
                q["wqkv_q"], q["sqkv"].reshape(1, 3 * width),
                p["attn"]["bqkv"].reshape(1, 3 * width),
                wo_q, so.reshape(1, width), p["attn"]["bo"].reshape(1, width))
        return pl.pallas_call(
            functools.partial(make_kernel(variant), heads=H, dim=dim,
                              scale=dim ** -0.5, eps=1e-5),
            out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
            grid=(bsz // group,),
            in_specs=[
                pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        )(*args)

    def stack(x, variant):
        def body(carry, p):
            if variant == "prod":
                q = p["attn_q"]
                out = int8_ln_qkv_attention(
                    carry, p["ln1"]["scale"], p["ln1"]["bias"],
                    q["wqkv_q"], q["sqkv"], p["attn"]["bqkv"], p["attn"]["wo"],
                    p["attn"]["bo"], None, heads=H)
            else:
                out = attn_var(carry, p, variant)
            return out, None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out

    x_tok = jnp.asarray(rng.standard_normal((256, SEQ, W)).astype(np.float32), dtype)

    def timed(variant):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, inner, lambda i, c: stack(c, variant),
                                     x).astype(jnp.float32).sum()
        float(loop(x_tok))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(loop(x_tok))
        dt = (time.perf_counter() - t0) / iters / inner
        print(f"attn stack [{variant:4s}]  {dt * 1e3:8.2f} ms/call", flush=True)

    def check(variant):
        a = np.asarray(stack(x_tok[:4], "prod").astype(jnp.float32))
        b = np.asarray(stack(x_tok[:4], variant).astype(jnp.float32))
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        print(f"  cosine[{variant} vs prod] = {cos:.6f}", flush=True)

    print(f"iters={iters} inner={inner} backend={jax.default_backend()}", flush=True)
    for variant in ("prod", "v1", "v2", "v3", "v4"):
        timed(variant)
    for variant in ("v1", "v2", "v3", "v4"):
        check(variant)


if __name__ == "__main__":
    main()
