"""Device-trace the TEXT half of the train step (fwd + bwd through the LoRA
adapters + optimizer) and print per-op time aggregation — ground truth for
the ~84 ms/step (B=256) that tools/train_profile.py attributes to the text
branch against a ~14 ms MAC floor.

    python tools/trace_text_train.py [batch] [steps]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from aiic_tpu.adapters import LoRAConfig
    from aiic_tpu.adapters.lora import init_text_lora
    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.models.clip import encode_text, normalize_features
    from aiic_tpu.train.trainer import TrainConfig, contrastive_loss, make_optimizer

    config = VIT_B_16
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 49400, (batch, 77)).astype(np.int32))
    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    cfg = TrainConfig(epochs=1, batch_size=batch, rank=16, alpha=32, dtype=jnp.bfloat16)
    lora = init_text_lora(jax.random.PRNGKey(1), config,
                          LoRAConfig(cfg.rank, cfg.alpha, cfg.attach))
    lora = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), lora)
    optimizer = make_optimizer(cfg, steps_per_epoch=10)
    opt_state = optimizer.init(lora)
    scaling = cfg.alpha / cfg.rank

    img_feats = jnp.asarray(
        rng.standard_normal((batch, config.embed_dim)).astype(np.float32))
    img_feats = (img_feats / np.linalg.norm(img_feats, axis=-1, keepdims=True)
                 ).astype(jnp.bfloat16)

    def step(lt, os_):
        def loss_fn(lora_tree):
            txt = normalize_features(
                encode_text(params, tokens, config, dtype=jnp.bfloat16,
                            attn_impl="pallas_vjp", remat=True,
                            lora=lora_tree, lora_scaling=scaling))
            return contrastive_loss(img_feats, txt, params["logit_scale"])
        loss, grads = jax.value_and_grad(loss_fn)(lt)
        updates, os2 = optimizer.update(grads, os_, lt)
        return loss, optax.apply_updates(lt, updates), os2

    fn = jax.jit(step)
    loss, lt, os_ = fn(lora, opt_state)
    float(loss)  # compile + warm

    logdir = "/tmp/aiic_trace_text"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        loss, lt, os_ = fn(lt, os_)
    float(loss)
    jax.profiler.stop_trace()

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace.json.gz found under", logdir, file=sys.stderr)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "tpu" in name or "/device" in name}

    agg = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e3
        agg[ev.get("name", "?")] += dur
        total += dur
    print(f"total device event time: {total:.1f} ms over {steps} steps")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms / steps:9.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
