"""Round-4 L/14 serving-ladder probes (VERDICT weak #5).

Per-stage budget at B=512 shows the int8 MLP stack (238 ms) and attention
stack (190 ms) dominating L/14 serving. This probe A/Bs, on the real chip:

1. MLP plan sweep: the calibrated planner's ('chunked', G=2, C=4) against
   the other blockings that fit VMEM — G=1/C=2 (the round-3 zoo config),
   G=1/C=4, G=2/C=8 — by monkeypatching quant._mlp_plan.
2. Attention path A/B: the monolithic G=1 whole-half-block kernel (current
   selection at L/14) against the large-S composition (XLA int8 batch-wide
   projections + Pallas all-heads core, quant._int8_attn_large_s) that
   @336 uses — at B*S scale the XLA projections pipeline without per-image
   weight re-fetch, which may win at S=257 too.

    AIIC_BENCH_MODEL=vit_l_14 python tools/kernel_experiments6.py [batch] [iters] [inner]
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

    from aiic_tpu.models import VIT_B_16, VIT_L_14, init_clip_params
    from aiic_tpu.ops import quant
    from aiic_tpu.ops.quant import quantize_model

    model = os.environ.get("AIIC_BENCH_MODEL", "vit_l_14")
    config = {"vit_b_16": VIT_B_16, "vit_l_14": VIT_L_14}[model]
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    inner = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    dtype = jnp.bfloat16

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    params = quantize_model(params)
    v = params["visual"]
    heads = config.vision.heads
    width = config.vision.width
    seq = (config.image_size // config.patch_size) ** 2 + 1

    rng = np.random.default_rng(0)
    x_tok = jnp.asarray(
        rng.standard_normal((batch, seq, width)).astype(np.float32), dtype)

    def timed_chained(stack, tag):
        @jax.jit
        def loop(x0):
            def body(i, x):
                return stack(x)
            out = jax.lax.fori_loop(0, inner, body, x0)
            return out.astype(jnp.float32).sum()

        try:
            float(loop(x_tok))
        except Exception as e:
            print(f"{tag:44s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return None
        t0 = time.perf_counter()
        for _ in range(iters):
            float(loop(x_tok))
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag:44s} {(dt / inner) * 1e3:8.2f} ms/call", flush=True)
        return dt / inner

    def mlp_stack(x):
        def body(carry, p):
            q = p["mlp_q"]
            return quant.int8_ln_mlp(
                carry, p["ln2"]["scale"], p["ln2"]["bias"],
                q["w1_q"], q["s1"], p["mlp"]["b1"],
                q["w2_q"], q["s2"], p["mlp"]["b2"]), None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out

    print(f"model={config.name} batch={batch} seq={seq} width={width} "
          f"heads={heads} backend={jax.default_backend()}", flush=True)

    n_layers = len(np.asarray(v["blocks"]["ln1"]["scale"]))
    baseline = quant._mlp_plan(batch, seq, width, width * 4, 2)
    print(f"planner default: {baseline}")

    orig_plan = quant._mlp_plan
    results = {}
    for plan in [baseline, ("chunked", 1, 2), ("chunked", 1, 4),
                 ("chunked", 2, 8), ("chunked", 1, 8)]:
        if plan[0] == "chunked":
            est = quant._mlp_chunk_vmem_bytes(plan[1], seq, width, width * 4,
                                              plan[2], 2)
            if est > quant._VMEM_BUDGET:
                print(f"mlp plan {plan}: skipped (est {est/1e6:.1f} MB over budget)")
                continue
        quant._mlp_plan = lambda *a, _p=plan, **k: _p
        try:
            results[plan] = timed_chained(
                mlp_stack, f"{n_layers}x int8 MLP plan={plan}")
        finally:
            quant._mlp_plan = orig_plan

    # ---- attention paths ------------------------------------------------
    def attn_stack_kernel(x):
        def body(carry, p):
            q = p["attn_q"]
            return quant.int8_ln_qkv_attention(
                carry, p["ln1"]["scale"], p["ln1"]["bias"],
                q["wqkv_q"], q["sqkv"], p["attn"]["bqkv"], p["attn"]["wo"],
                p["attn"]["bo"], None, heads=heads), None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out

    def attn_stack_large_s(x):
        mask = jnp.zeros((seq, seq), jnp.float32)

        def body(carry, p):
            q = p["attn_q"]
            return quant._int8_attn_large_s(
                carry, p["ln1"]["scale"].reshape(1, width),
                p["ln1"]["bias"].reshape(1, width),
                q["wqkv_q"], q["sqkv"].reshape(1, 3 * width),
                p["attn"]["bqkv"].reshape(1, 3 * width),
                p["attn"]["wo"].astype(x.dtype),
                p["attn"]["bo"].reshape(1, width),
                mask, heads=heads, eps=1e-5, interpret=False), None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out

    timed_chained(attn_stack_kernel, f"{n_layers}x int8 attn G=1 whole-half-block")
    timed_chained(attn_stack_large_s, f"{n_layers}x int8 attn XLA-proj + core")


if __name__ == "__main__":
    main()
