"""Third experiment batch: pass-cost breakdown of the int8 MLP kernel
(28.1 ms/stack at B=256 vs an ~11.5-23 ms matmul floor depending on the
true in-kernel int8 MAC rate).

Timing ABLATIONS (numerically wrong, cost-attribution only):
  nogelu   gelu pass removed
  noln     LN pass removed (raw x quantized)
  noq      both row-quant passes removed AND both matmuls in bf16
           (the all-bf16 kernel: measures quant-pass + int8-rate together)
  maconly  LN/quant/gelu all removed; the two int8 matmuls on pre-quantized
           constants — the true in-kernel int8 MAC floor
  macbf16  same but bf16 matmuls — the true in-kernel bf16 MAC floor

REAL candidates (cosine-checked vs prod):
  q2bf16   second matmul in bf16 (skips the (rows,3072) row-quant of the
           gelu output — the widest VPU pass — at bf16 MAC rate for mm2)
  gelu2    gelu via exp2: sigmoid(1.702 y) = 1/(1+exp2(-1.702*log2e*y)),
           fp32 (dodges nothing yet; baseline for the bf16 form)
  gelubf16 gelu in bf16 via the manual exp2 form (Mosaic cannot lower bf16
           `logistic`; exp2+reciprocal may lower)

    python tools/kernel_experiments3.py [iters] [inner]
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
    from aiic_tpu.ops.quant import _row_quant, int8_ln_mlp, quantize_model

    config = VIT_B_16
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16
    W = config.vision.width
    M = 4 * W
    SEQ = (224 // config.patch_size) ** 2 + 1

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    qparams = quantize_model(params)
    v = qparams["visual"]
    # carry bf16 weights alongside for the bf16-matmul variants
    v = dict(v)
    v["blocks"] = dict(v["blocks"])
    v["blocks"]["mlp_bf16"] = {
        "w1": params["visual"]["blocks"]["mlp"]["w1"],
        "w2": params["visual"]["blocks"]["mlp"]["w2"],
    }
    rng = np.random.default_rng(0)

    def make_kernel(variant):
        def kernel(x_ref, ln_s_ref, ln_b_ref, w1_ref, s1_ref, b1_ref,
                   w2_ref, s2_ref, b2_ref, w1f_ref, w2f_ref, o_ref, *, eps):
            group, seq, width = x_ref.shape
            x = x_ref[:].reshape(group * seq, width)
            xf = x.astype(jnp.float32)

            if variant == "maconly":
                hq = jnp.full((group * seq, width), 3, jnp.int8)
                acc = jax.lax.dot_general(
                    hq, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)
                yq = jnp.clip(acc, -127, 127).astype(jnp.int8)
                acc2 = jax.lax.dot_general(
                    yq, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)
                o_ref[:] = (xf + acc2.astype(jnp.float32)).astype(
                    x_ref.dtype).reshape(group, seq, width)
                return
            if variant == "macbf16":
                hb = x  # bf16 as-is
                y = jax.lax.dot_general(
                    hb, w1f_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                out = jax.lax.dot_general(
                    y.astype(x.dtype), w2f_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                o_ref[:] = (xf + out).astype(x_ref.dtype).reshape(
                    group, seq, width)
                return

            if variant == "noln":
                h = xf
            else:
                mean = jnp.mean(xf, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
                h = (xf - mean) * jax.lax.rsqrt(var + eps)
                h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)

            if variant == "noq":
                y = jax.lax.dot_general(
                    h.astype(x.dtype), w1f_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                y = y + b1_ref[:].astype(jnp.float32)
            else:
                hq, hscale = _row_quant(h)
                acc = jax.lax.dot_general(
                    hq, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)
                y = acc.astype(jnp.float32) * hscale * s1_ref[:] + b1_ref[:].astype(jnp.float32)

            if variant == "nogelu":
                pass
            elif variant == "gelu2":
                p = jnp.exp2(jnp.float32(-1.702 * LOG2E) * y)
                y = y * (1.0 / (1.0 + p))
            elif variant == "gelubf16":
                yb = y.astype(jnp.bfloat16)
                p = jnp.exp2(jnp.bfloat16(-1.702 * LOG2E) * yb)
                y = (yb * (jnp.bfloat16(1.0) / (jnp.bfloat16(1.0) + p))).astype(jnp.float32)
            else:
                y = y * jax.nn.sigmoid(1.702 * y)

            if variant in ("noq", "q2bf16"):
                out = jax.lax.dot_general(
                    y.astype(x.dtype), w2f_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                out = out + b2_ref[:].astype(jnp.float32)
            else:
                yq, yscale = _row_quant(y)
                acc2 = jax.lax.dot_general(
                    yq, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)
                out = acc2.astype(jnp.float32) * yscale * s2_ref[:] + b2_ref[:].astype(jnp.float32)
            o_ref[:] = (xf + out).astype(x_ref.dtype).reshape(group, seq, width)
        return kernel

    def mlp_var(x, p, variant):
        bsz, seq, width = x.shape
        q = p["mlp_q"]
        group = 2
        return pl.pallas_call(
            functools.partial(make_kernel(variant), eps=1e-5),
            out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
            grid=(bsz // group,),
            in_specs=[
                pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, M), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((M, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, M), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((M, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        )(x, p["ln2"]["scale"].reshape(1, width), p["ln2"]["bias"].reshape(1, width),
          q["w1_q"], q["s1"].reshape(1, M), p["mlp"]["b1"].reshape(1, M),
          q["w2_q"], q["s2"].reshape(1, width), p["mlp"]["b2"].reshape(1, width),
          p["mlp_bf16"]["w1"], p["mlp_bf16"]["w2"])

    def stack(x, variant):
        def body(carry, p):
            if variant == "prod":
                q = p["mlp_q"]
                out = int8_ln_mlp(carry, p["ln2"]["scale"], p["ln2"]["bias"],
                                  q["w1_q"], q["s1"], p["mlp"]["b1"],
                                  q["w2_q"], q["s2"], p["mlp"]["b2"])
            else:
                out = mlp_var(carry, p, variant)
            return out, None
        blocks = {k: v["blocks"][k] for k in ("ln2", "mlp", "mlp_q", "mlp_bf16")}
        out, _ = jax.lax.scan(body, x, blocks)
        return out

    x_tok = jnp.asarray(rng.standard_normal((256, SEQ, W)).astype(np.float32), dtype)

    def timed(variant):
        try:
            @jax.jit
            def loop(x):
                return jax.lax.fori_loop(0, inner, lambda i, c: stack(c, variant),
                                         x).astype(jnp.float32).sum()
            float(loop(x_tok))
            t0 = time.perf_counter()
            for _ in range(iters):
                float(loop(x_tok))
            dt = (time.perf_counter() - t0) / iters / inner
            print(f"mlp stack [{variant:9s}]  {dt * 1e3:8.2f} ms/call", flush=True)
        except Exception as e:  # noqa: BLE001 - probe tool, report and move on
            print(f"mlp stack [{variant:9s}]  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    def check(variant):
        try:
            a = np.asarray(stack(x_tok[:4], "prod").astype(jnp.float32))
            b = np.asarray(stack(x_tok[:4], variant).astype(jnp.float32))
            cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
            print(f"  cosine[{variant} vs prod] = {cos:.6f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  cosine[{variant}] FAILED: {type(e).__name__}", flush=True)

    all_variants = ("prod", "nogelu", "noln", "noq", "maconly", "macbf16",
                    "q2bf16", "gelu2", "gelubf16")
    variants = sys.argv[3].split(",") if len(sys.argv) > 3 else all_variants
    print(f"iters={iters} inner={inner} backend={jax.default_backend()}", flush=True)
    for variant in variants:
        timed(variant)
    for variant in variants:
        if variant in ("q2bf16", "gelu2", "gelubf16"):
            check(variant)


if __name__ == "__main__":
    main()
