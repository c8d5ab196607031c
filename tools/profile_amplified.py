"""RTT-free component breakdown of the serving step.

step_profile.py times isolated jits and subtracts an estimated ~31 ms relay
round trip — noisy at the 1-5 ms scale. Here every component is repeated
INNER times *inside one jit* (chained through the carry, so iterations can't
be CSE'd or overlapped away) and the loop is timed; per-call cost = loop/INNER
with the single fixed RTT amortized to noise.

    python tools/profile_amplified.py [batch] [iters] [inner]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aiic_tpu.models import (
        VIT_B_16, VIT_B_32, VIT_L_14, VIT_L_14_336, init_clip_params,
    )
    from aiic_tpu.models.clip import layer_norm, patchify, run_tower
    from aiic_tpu.engine.programs import classify_batch
    from aiic_tpu.ops.preprocess import normalize_u8
    from aiic_tpu.ops.quant import quantize_model

    # AIIC_BENCH_MODEL selects the preset (same env contract as bench.py)
    model = os.environ.get("AIIC_BENCH_MODEL", "vit_b_16")
    config = {"vit_b_16": VIT_B_16, "vit_b_32": VIT_B_32,
              "vit_l_14": VIT_L_14, "vit_l_14_336": VIT_L_14_336}[model]
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    inner = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    dtype = jnp.bfloat16

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    params = quantize_model(params)
    v = params["visual"]

    rng = np.random.default_rng(0)
    size = config.image_size
    pixels = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    seq = (size // config.patch_size) ** 2 + 1
    x_tok = jnp.asarray(
        rng.standard_normal((batch, seq, config.vision.width)).astype(np.float32), dtype
    )

    det_text = rng.standard_normal((40, config.embed_dim)).astype(np.float32)
    det_text /= np.linalg.norm(det_text, axis=-1, keepdims=True)
    det_text = jnp.asarray(det_text)
    cat_text = jnp.asarray(rng.standard_normal((5, 304, config.embed_dim)).astype(np.float32))
    cat_mask = jnp.asarray(np.ones((5, 304), bool))

    def timed_chained(stack, tag):
        """stack: (B,S,W) -> (B,S,W); chained INNER times inside one jit."""
        @jax.jit
        def loop(x0):
            def body(i, x):
                return stack(x)
            out = jax.lax.fori_loop(0, inner, body, x0)
            return out.astype(jnp.float32).sum()

        float(loop(x_tok))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(loop(x_tok))
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag:38s} {(dt / inner) * 1e3:8.2f} ms/call  (loop {dt*1e3:6.1f} ms)",
              flush=True)
        return dt / inner

    def attn_stack(x):
        from aiic_tpu.ops.quant import int8_ln_qkv_attention

        def body(carry, p):
            q = p["attn_q"]
            return int8_ln_qkv_attention(
                carry, p["ln1"]["scale"], p["ln1"]["bias"],
                q["wqkv_q"], q["sqkv"], p["attn"]["bqkv"], p["attn"]["wo"],
                p["attn"]["bo"], None, heads=config.vision.heads), None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out

    def mlp_stack(x):
        from aiic_tpu.ops.quant import int8_ln_mlp

        def body(carry, p):
            q = p["mlp_q"]
            return int8_ln_mlp(carry, p["ln2"]["scale"], p["ln2"]["bias"],
                               q["w1_q"], q["s1"], p["mlp"]["b1"],
                               q["w2_q"], q["s2"], p["mlp"]["b2"]), None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out

    def tower_stack(x):
        return run_tower(x, v["blocks"], config.vision.heads, None,
                         config.gelu_type, attn_impl="pallas")

    def embed_chained(tag):
        @jax.jit
        def loop(px):
            def body(i, acc):
                x = patchify(normalize_u8(jnp.bitwise_xor(px, i.astype(jnp.uint8))).astype(dtype),
                             config.patch_size)
                x = jnp.dot(x, v["patch_embed"].astype(dtype),
                            preferred_element_type=jnp.float32).astype(dtype)
                cls = jnp.broadcast_to(v["cls"].astype(dtype), (x.shape[0], 1, x.shape[-1]))
                x = jnp.concatenate([cls, x], axis=1) + v["pos"].astype(dtype)
                x = layer_norm(x, v["ln_pre"])
                return acc + x.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

        float(loop(pixels))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(loop(pixels))
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag:38s} {(dt / inner) * 1e3:8.2f} ms/call  (loop {dt*1e3:6.1f} ms)",
              flush=True)

    def full_chained(tag):
        @jax.jit
        def loop(px):
            def body(i, acc):
                out = classify_batch(params, jnp.bitwise_xor(px, i.astype(jnp.uint8)),
                                     det_text, cat_text, cat_mask,
                                     config=config, interior_count=11, dtype=dtype,
                                     attn_impl="pallas")
                return acc + out["interior_mass"].sum() + out["topk_vals"].sum()
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

        float(loop(pixels))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(loop(pixels))
        dt = (time.perf_counter() - t0) / iters
        per = dt / inner
        print(f"{tag:38s} {per * 1e3:8.2f} ms/call  (loop {dt*1e3:6.1f} ms)  "
              f"-> {batch / per:.0f} img/s device", flush=True)

    print(f"model={config.name} batch={batch} iters={iters} inner={inner} backend={jax.default_backend()}",
          flush=True)
    embed_chained("embed (u8 norm+patchify+pos+ln)")
    timed_chained(attn_stack, f"{len(v['blocks']['ln1']['scale'])}x attention half-block int8")
    timed_chained(mlp_stack, f"{len(v['blocks']['ln1']['scale'])}x MLP half-block int8")
    timed_chained(tower_stack, f"{len(v['blocks']['ln1']['scale'])}x full blocks (tower scan)")
    full_chained("FULL classify program")


if __name__ == "__main__":
    main()
