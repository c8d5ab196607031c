"""Round-3 train-step experiments (VERDICT #2: target >= 2,200 img/s bf16
at B=256; round-2 exit was 1,624 img/s / 157.6 ms).

Measures, in ONE TPU session (remote compiles are expensive — batch them):

  base      — round-2 shipped config (full remat, pallas_vjp text attention)
  dots      — selective remat (stash matmul outputs, recompute elementwise)
  noremat   — no remat (stash everything through the scan)
  bf16ln    — LayerNorm statistics in bf16 on the TRAINING text tower
              (serving keeps fp32 stats; gradients tolerate lower precision)
  b512      — batch 512 (fixed-cost amortization)
  combos of winners

    python tools/train_experiments.py [iters]

Prints one JSON line per variant. NO `timeout` leash — a SIGTERM'd TPU
client wedges the chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(name, batch, iters, tcfg_kwargs, patch_ln=False):
    import jax
    import jax.numpy as jnp

    import aiic_tpu.models.clip as clip_mod
    from aiic_tpu.adapters import LoRAConfig, init_text_lora
    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    config = VIT_B_16
    tcfg = TrainConfig(epochs=1, batch_size=batch, rank=16, alpha=32,
                       dtype=jnp.bfloat16, **tcfg_kwargs)

    orig_ln = clip_mod.layer_norm
    if patch_ln:
        from jax import lax

        def bf16_layer_norm(x, p, eps=1e-5):
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
            y = (x - mean) * lax.rsqrt(var + jnp.asarray(eps, x.dtype))
            return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)

        clip_mod.layer_norm = bf16_layer_norm
    try:
        params = init_clip_params(jax.random.PRNGKey(0), config)
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
        if tcfg_kwargs.get("quantize_image"):
            from aiic_tpu.ops.quant import quantize_model_mlp

            params = quantize_model_mlp(params, attn=True, towers=("visual",))
        lora = init_text_lora(jax.random.PRNGKey(1), config,
                              LoRAConfig(16, 32, tcfg.attach))
        opt = make_optimizer(tcfg, steps_per_epoch=100)
        opt_state = opt.init(lora)
        train_step, _ = make_train_step(config, tcfg, opt)
        jt = jax.jit(train_step, donate_argnums=(1, 2))

        rng = np.random.default_rng(0)
        pixels = jnp.asarray(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32), jnp.bfloat16)
        tokens = rng.integers(1, 49400, (batch, 77)).astype(np.int32)
        tokens[:, 0] = 49406
        tokens[:, -1] = 49407
        tokens = jnp.asarray(tokens)
        key = jax.random.PRNGKey(0)

        t0 = time.perf_counter()
        loss, lora, opt_state = jt(params, lora, opt_state, pixels, tokens, key)
        loss = float(loss)
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(iters):
            loss, lora, opt_state = jt(params, lora, opt_state, pixels, tokens, key)
            loss = float(loss)  # hard sync (block_until_ready is a no-op here)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "variant": name, "batch": batch,
            "ms_per_step": round(dt * 1e3, 1),
            "img_per_sec": round(batch / dt, 1),
            "loss": round(loss, 4), "compile_s": round(compile_s, 1),
        }), flush=True)
        return batch / dt
    finally:
        clip_mod.layer_norm = orig_ln


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = sys.argv[2] if len(sys.argv) > 2 else None
    variants = [
        ("base", 256, dict(), False),
        ("dots", 256, dict(remat_text="dots"), False),
        ("noremat", 256, dict(remat_text=False), False),
        ("bf16ln", 256, dict(), True),
        ("bf16ln_dots", 256, dict(remat_text="dots"), True),
        ("b512", 512, dict(), False),
        ("b512_bf16ln", 512, dict(), True),
        # whole-text-block backward kernel (ops/block_grad)
        ("blockbwd", 256, dict(attn_impl="block_fused"), False),
        ("blockbwd_b512", 512, dict(attn_impl="block_fused"), False),
        ("blockbwd_int8", 256, dict(attn_impl="block_fused",
                                    quantize_image=True), False),
        ("blockbwd_int8_b512", 512, dict(attn_impl="block_fused",
                                         quantize_image=True), False),
    ]
    for name, batch, kw, patch in variants:
        if only and only != name:
            continue
        try:
            measure(name, batch, iters, kw, patch_ln=patch)
        except Exception as e:  # keep the session going; report the failure
            print(json.dumps({"variant": name, "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
