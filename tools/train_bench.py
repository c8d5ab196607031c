"""LoRA training-step throughput on the real chip (BASELINE config #4).

    python tools/train_bench.py [batch] [iters] [int8] [block] [cached]
                                [dedup[=P]]

``int8`` quantizes the frozen image tower (serving-numerics adapters);
``block`` selects the whole-text-block backward kernel (attn_impl
block_fused — ~5-22 min first cold Mosaic compile, fastest steady state:
2681 img/s at batch 1024 with int8); ``cached`` measures the feature-cache
steady state (TrainConfig.cache_image_features, the train_lora default):
image features precomputed once, every step text-only. ``dedup`` (implies
cached) measures the prompt-dedup steady state — the text tower encodes a
P-prompt pool (default 64, the reference dataset's scale) instead of the
dense batch (TrainConfig.dedup_prompts, the train_lora default). Synthetic
batch (compute-path benchmark); prints steps/sec and images/sec to stderr
and one JSON line to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aiic_tpu.adapters import LoRAConfig, init_text_lora
    from aiic_tpu.models import VIT_B_16, VIT_B_32, VIT_L_14, init_clip_params
    from aiic_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    model = "vit_b_16"
    for a in sys.argv[3:]:
        if a.startswith("model="):
            model = a.split("=")[1]
    quantize = "int8" in sys.argv[3:]
    # "text8": the int8 whole-block TEXT kernel pair (serving-numerics text
    # tower, STE gradients) — implies block_fused.
    quantize_text = "text8" in sys.argv[3:]
    cached = "cached" in sys.argv[3:]
    pool_size = 0
    for a in sys.argv[3:]:
        if a == "dedup" or a.startswith("dedup="):
            pool_size = int(a.split("=")[1]) if "=" in a else 64
            cached = True
    impl = ("block_fused" if ("block" in sys.argv[3:] or quantize_text)
            else "auto")
    config = {"vit_b_16": VIT_B_16, "vit_b_32": VIT_B_32,
              "vit_l_14": VIT_L_14}[model]
    tcfg = TrainConfig(epochs=1, batch_size=batch, rank=16, alpha=32,
                       dtype=jnp.bfloat16, quantize_image=quantize,
                       quantize_text=quantize_text, attn_impl=impl)

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    if quantize or quantize_text:
        from aiic_tpu.ops.quant import quantize_model_mlp
        towers = tuple(t for t, on in (("visual", quantize),
                                       ("text", quantize_text)) if on)
        params = quantize_model_mlp(params, attn=True, towers=towers)
    lora = init_text_lora(jax.random.PRNGKey(1), config, LoRAConfig(16, 32, tcfg.attach))
    opt = make_optimizer(tcfg, steps_per_epoch=100)
    opt_state = opt.init(lora)
    rng = np.random.default_rng(0)
    prompt_pool = None
    if pool_size:
        prompt_pool = rng.integers(1, 49400, (pool_size, 77)).astype(np.int32)
        prompt_pool[:, 0] = 49406
        prompt_pool[:, -1] = 49407
    train_step, _ = make_train_step(config, tcfg, opt, cached_image=cached,
                                    prompt_pool=prompt_pool)
    jt = jax.jit(train_step, donate_argnums=(1, 2))

    pixels = jnp.asarray(
        rng.standard_normal(
            (batch, config.image_size, config.image_size, 3)
        ).astype(np.float32), jnp.bfloat16)
    if cached:
        # The steady state of feature-cache training: the tower ran ONCE up
        # front (at serving throughput, see bench.py); each step consumes
        # the precomputed [B, D] slice.
        ifn = jax.jit(train_step.image_features)
        t0 = time.perf_counter()
        feats = ifn(params, pixels)
        float(jnp.sum(feats))  # hard sync
        print(f"feature precompute (once per dataset pass): "
              f"{time.perf_counter()-t0:.1f}s for {batch} images", file=sys.stderr)
        pixels = feats
    if pool_size:
        tokens = jnp.asarray(
            rng.integers(0, pool_size, (batch,)).astype(np.int32))
    else:
        tokens = rng.integers(1, 49400, (batch, 77)).astype(np.int32)
        tokens[:, 0] = 49406
        tokens[:, -1] = 49407
        tokens = jnp.asarray(tokens)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    loss, lora, opt_state = jt(params, lora, opt_state, pixels, tokens, key)
    loss = float(loss)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s loss={loss:.4f}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(iters):
        loss, lora, opt_state = jt(params, lora, opt_state, pixels, tokens, key)
        loss = float(loss)  # hard sync
    dt = (time.perf_counter() - t0) / iters
    print(f"{dt*1e3:.1f} ms/step -> {batch/dt:.1f} img/s (train)", file=sys.stderr)
    out = {
        "metric": "train_images_per_sec_per_chip",
        "value": round(batch / dt, 1),
        "unit": "img/s",
        "batch": batch,
        "final_loss": round(loss, 4),
    }
    if cached:
        out["cached_features"] = True
    if pool_size:
        out["prompt_pool"] = pool_size
    if model != "vit_b_16":
        out["model"] = config.name
    print(json.dumps(out))


if __name__ == "__main__":
    main()
