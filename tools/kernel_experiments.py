"""One-session kernel experiments: where do the ~17 ms of VPU overhead go?

Amplified (in-jit chained) timings of kernel VARIANTS against the production
int8 kernels, plus full-program batch-size scaling. Variants live here, not
in ops/ — only measured winners get productionized.

  1. full program at B=256 / B=512 (grid amortization)
  2. attention stack: production vs no-max-subtract softmax (fp32 exp is
     range-safe for |scores| < ~80; skips a (S,S) max-reduce + subtract)
  3. MLP stack: production vs bf16 gelu epilogue
  4. MLP stack: static per-tensor activation scale (no amax reduce) —
     ceiling measurement for calibrated static quant

    python tools/kernel_experiments.py [iters] [inner]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.ops.quant import (
        quantize_weight,
        _row_quant, int8_ln_mlp, int8_ln_qkv_attention, quantize_model,
    )

    config = VIT_B_16
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16
    W = config.vision.width          # 768
    H = config.vision.heads          # 12
    D = W // H                       # 64
    M = 4 * W                        # 3072
    SEQ = (224 // config.patch_size) ** 2 + 1

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    params = quantize_model(params)
    v = params["visual"]

    rng = np.random.default_rng(0)

    def timed_chained(stack, x0, tag):
        @jax.jit
        def loop(x):
            def body(i, c):
                return stack(c)
            return jax.lax.fori_loop(0, inner, body, x).astype(jnp.float32).sum()

        float(loop(x0))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(loop(x0))
        dt = (time.perf_counter() - t0) / iters / inner
        print(f"{tag:46s} {dt * 1e3:8.2f} ms/call", flush=True)
        return dt

    # ---- experiment 2: attention softmax variants ------------------------
    def attn_stack(x, nomax):
        def body(carry, p):
            q = p["attn_q"]
            if nomax:
                # historical variant keeps the int8 out-projection; the prod
                # tree no longer carries wo_q/so (out proj is bf16 now)
                wo_q, so = quantize_weight(p["attn"]["wo"])
                out = int8_attn_nomax(
                    carry, p["ln1"]["scale"], p["ln1"]["bias"],
                    q["wqkv_q"], q["sqkv"], p["attn"]["bqkv"], wo_q, so,
                    p["attn"]["bo"], None, heads=H)
            else:
                out = int8_ln_qkv_attention(
                    carry, p["ln1"]["scale"], p["ln1"]["bias"],
                    q["wqkv_q"], q["sqkv"], p["attn"]["bqkv"], p["attn"]["wo"],
                    p["attn"]["bo"], None, heads=H)
            return out, None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out

    def _nomax_kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                      wo_ref, so_ref, bo_ref, o_ref,
                      *, heads, dim, scale, eps):
        width = heads * dim
        group, seq, _ = x_ref.shape
        x = x_ref[:].reshape(group * seq, width)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + eps)
        h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
        hq, hscale = _row_quant(h)
        acc = jax.lax.dot_general(
            hq, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32, precision=jax.lax.Precision.DEFAULT)
        qkv = (acc.astype(jnp.float32) * hscale * sqkv_ref[:]
               + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)
        attns = []
        for g in range(group):
            tile = qkv[g * seq:(g + 1) * seq]
            outs = []
            for hd in range(heads):
                q = tile[:, hd * dim:(hd + 1) * dim]
                k = tile[:, width + hd * dim: width + (hd + 1) * dim]
                vv = tile[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                s = jax.lax.dot_general(
                    q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) * scale
                # NO max subtraction: fp32 exp overflows only past ~88
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                outs.append(jnp.dot(p.astype(vv.dtype), vv,
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

    def int8_attn_nomax(x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wo_q, so, bo,
                        mask=None, *, heads):
        bsz, seq, width = x.shape
        dim = width // heads
        group = 2 if bsz % 2 == 0 else 1
        return pl.pallas_call(
            functools.partial(_nomax_kernel, heads=heads, dim=dim,
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
        )(x, ln_scale.reshape(1, width), ln_bias.reshape(1, width),
          wqkv_q, sqkv.reshape(1, 3 * width), bqkv.reshape(1, 3 * width),
          wo_q, so.reshape(1, width), bo.reshape(1, width))

    # ---- experiments 3/4: MLP variants -----------------------------------
    def _mlp_kernel_var(x_ref, ln_s_ref, ln_b_ref, w1_ref, s1_ref, b1_ref,
                        w2_ref, s2_ref, b2_ref, o_ref, *, eps, gelu_bf16,
                        static_scale):
        group, seq, width = x_ref.shape
        x = x_ref[:].reshape(group * seq, width)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + eps)
        h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
        if static_scale:
            hs = jnp.float32(6.0 / 127.0)   # plausible post-LN range
            hq = jnp.clip(jnp.round(h * (1.0 / hs)), -127, 127).astype(jnp.int8)
            hscale = hs
        else:
            hq, hscale = _row_quant(h)
        acc = jax.lax.dot_general(
            hq, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32, precision=jax.lax.Precision.DEFAULT)
        y = acc.astype(jnp.float32) * hscale * s1_ref[:] + b1_ref[:].astype(jnp.float32)
        # NOTE: a bf16 gelu variant (sigmoid on bf16 vectors) fails to lower —
        # Mosaic's logistic lowering emits a mismatched f32->bf16
        # vector.broadcast. gelu stays fp32.
        del gelu_bf16
        y = y * jax.nn.sigmoid(1.702 * y)
        if static_scale:
            ys = jnp.float32(30.0 / 127.0)
            yq = jnp.clip(jnp.round(y * (1.0 / ys)), -127, 127).astype(jnp.int8)
            yscale = ys
        else:
            yq, yscale = _row_quant(y)
        acc2 = jax.lax.dot_general(
            yq, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32, precision=jax.lax.Precision.DEFAULT)
        out = acc2.astype(jnp.float32) * yscale * s2_ref[:] + b2_ref[:].astype(jnp.float32)
        o_ref[:] = (xf + out).astype(x_ref.dtype).reshape(group, seq, width)

    def mlp_var(x, ln_scale, ln_bias, w1_q, s1, b1, w2_q, s2, b2, *,
                gelu_bf16=False, static_scale=False):
        bsz, seq, width = x.shape
        mlp_dim = w1_q.shape[-1]
        group = 2 if bsz % 2 == 0 else 1
        return pl.pallas_call(
            functools.partial(_mlp_kernel_var, eps=1e-5, gelu_bf16=gelu_bf16,
                              static_scale=static_scale),
            out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
            grid=(bsz // group,),
            in_specs=[
                pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, mlp_dim), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mlp_dim), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mlp_dim), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mlp_dim, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        )(x, ln_scale.reshape(1, width), ln_bias.reshape(1, width),
          w1_q, s1.reshape(1, mlp_dim), b1.reshape(1, mlp_dim),
          w2_q, s2.reshape(1, width), b2.reshape(1, width))

    def mlp_stack(x, **kw):
        def body(carry, p):
            q = p["mlp_q"]
            if kw:
                out = mlp_var(carry, p["ln2"]["scale"], p["ln2"]["bias"],
                              q["w1_q"], q["s1"], p["mlp"]["b1"],
                              q["w2_q"], q["s2"], p["mlp"]["b2"], **kw)
            else:
                out = int8_ln_mlp(carry, p["ln2"]["scale"], p["ln2"]["bias"],
                                  q["w1_q"], q["s1"], p["mlp"]["b1"],
                                  q["w2_q"], q["s2"], p["mlp"]["b2"])
            return out, None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out

    # ---- experiment 1: full program batch scaling ------------------------
    from aiic_tpu.engine.programs import classify_batch

    det_text = rng.standard_normal((40, config.embed_dim)).astype(np.float32)
    det_text /= np.linalg.norm(det_text, axis=-1, keepdims=True)
    det_text = jnp.asarray(det_text)
    cat_text = jnp.asarray(rng.standard_normal((5, 304, config.embed_dim)).astype(np.float32))
    cat_mask = jnp.asarray(np.ones((5, 304), bool))

    def full_at(batch):
        px = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8))

        @jax.jit
        def loop(px):
            def body(i, acc):
                out = classify_batch(params, jnp.bitwise_xor(px, i.astype(jnp.uint8)),
                                     det_text, cat_text, cat_mask,
                                     config=config, interior_count=11, dtype=dtype,
                                     attn_impl="pallas")
                return acc + out["interior_mass"].sum() + out["topk_vals"].sum()
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

        float(loop(px))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(loop(px))
        dt = (time.perf_counter() - t0) / iters / inner
        print(f"full program B={batch:4d}                        "
              f"{dt * 1e3:8.2f} ms/call -> {batch / dt:.0f} img/s", flush=True)

    print(f"iters={iters} inner={inner} backend={jax.default_backend()}", flush=True)
    x_tok = jnp.asarray(rng.standard_normal((256, SEQ, W)).astype(np.float32), dtype)
    only = sys.argv[4] if len(sys.argv) > 4 else "all"
    if only in ("all", "attn"):
        timed_chained(lambda x: attn_stack(x, False), x_tok, "attn stack (production)")
        timed_chained(lambda x: attn_stack(x, True), x_tok, "attn stack (no-max softmax)")
    if only in ("all", "mlp"):
        timed_chained(lambda x: mlp_stack(x), x_tok, "MLP stack (production)")
        timed_chained(lambda x: mlp_stack(x, static_scale=True), x_tok,
                      "MLP stack (static act scales)")
    if only in ("all", "full"):
        full_at(256)
        full_at(512)


if __name__ == "__main__":
    main()
