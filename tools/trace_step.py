"""Device-trace the serving step and print per-op time aggregation.

Runs a few bench-config classify steps under jax.profiler, then parses the
perfetto trace.json.gz and aggregates device-track event durations by op
name. This is the ground truth for where the step time goes (the step_profile
tool measures component jits, which include dispatch RTT per sync).

    python tools/trace_step.py [batch] [steps]
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

    from aiic_tpu.engine.detector import DETECTOR_CATEGORIES, INTERIOR_COUNT
    from aiic_tpu.engine.programs import classify_batch
    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.ops.quant import quantize_model

    config = VIT_B_16
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    params = quantize_model(params)

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8))
    det_text = rng.standard_normal((len(DETECTOR_CATEGORIES), config.embed_dim)).astype(np.float32)
    det_text /= np.linalg.norm(det_text, axis=-1, keepdims=True)
    det_text = jnp.asarray(det_text)
    cat_text = jnp.asarray(rng.standard_normal((5, 304, config.embed_dim)).astype(np.float32))
    cat_mask = jnp.asarray(np.ones((5, 304), bool))

    def program(params, px):
        out = classify_batch(params, px, det_text, cat_text, cat_mask,
                             config=config, interior_count=INTERIOR_COUNT,
                             dtype=jnp.bfloat16, attn_impl="pallas")
        return out["interior_mass"].sum() + out["topk_vals"].sum()

    fn = jax.jit(program)
    float(fn(params, pixels))  # compile + warm

    logdir = "/tmp/aiic_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        s = fn(params, pixels)
    float(s)
    jax.profiler.stop_trace()

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace.json.gz found under", logdir, file=sys.stderr)
        listing = glob.glob(f"{logdir}/**/*", recursive=True)
        print("\n".join(listing[:40]), file=sys.stderr)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # find device (TPU) process ids
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
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        agg[name] += dur
        total += dur
    print(f"device pids: { {p: pid_names.get(p) for p in device_pids} }")
    print(f"total device event time: {total:.1f} ms over {steps} steps")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms / steps:9.3f} ms/step  {name[:100]}")


if __name__ == "__main__":
    main()
