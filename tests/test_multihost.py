"""Multi-host data-parallel input path (SURVEY §2d): a REAL 2-process JAX
cluster on CPU, each process feeding only its shard of the global batch via
``jax.make_array_from_process_local_data`` (parallel/multihost.py), running
the sharded LoRA train step. The parent then reproduces the same global batch
single-process and requires loss equality.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent("""
    import json, os, sys
    import numpy as np

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc          # global
    assert len(jax.local_devices()) == 4            # per host

    import jax.numpy as jnp
    from aiic_tpu.adapters import LoRAConfig, init_text_lora
    from aiic_tpu.models import TINY_TEST, init_clip_params
    from aiic_tpu.parallel import create_mesh, shard_train_step
    from aiic_tpu.parallel.multihost import host_local_batch
    from aiic_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    config = TINY_TEST
    tcfg = TrainConfig(epochs=1, batch_size=8, rank=2, alpha=4,
                       attach=("c_fc", "c_proj", "out_proj"))
    params = init_clip_params(jax.random.PRNGKey(0), config)
    lora = init_text_lora(jax.random.PRNGKey(1), config, LoRAConfig(2, 4, tcfg.attach))
    opt = make_optimizer(tcfg, steps_per_epoch=1)
    opt_state = opt.init(lora)
    train_step, eval_step = make_train_step(config, tcfg, opt)

    mesh = create_mesh(4 * nproc, tp=2)
    jt, _, sp, sl, so = shard_train_step(mesh, train_step, eval_step, params, lora, opt_state)

    # Each process loads ONLY its quarter of the global batch (rows are a
    # deterministic function of the global row index, so the single-process
    # reference can rebuild the identical global batch).
    rng = np.random.default_rng(0)
    g_pixels = rng.standard_normal((8, config.image_size, config.image_size, 3)).astype(np.float32)
    g_tokens = rng.integers(1, config.vocab_size - 2, (8, config.context_length)).astype(np.int32)
    g_tokens[:, 0] = config.vocab_size - 2
    g_tokens[:, -1] = config.vocab_size - 1
    lo, hi = pid * 8 // nproc, (pid + 1) * 8 // nproc
    pixels = host_local_batch(mesh, g_pixels[lo:hi])
    tokens = host_local_batch(mesh, g_tokens[lo:hi])
    assert pixels.shape[0] == 8, pixels.shape    # global leading dim

    loss, new_lora, _ = jt(sp, sl, so, pixels, tokens, jax.random.PRNGKey(0))
    out = {"pid": pid, "loss": float(loss)}
    print("RESULT " + json.dumps(out), flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD, encoding="utf-8")

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"child failed:\n{stderr[-3000:]}"
        line = [l for l in stdout.splitlines() if l.startswith("RESULT ")][0]
        outs.append(json.loads(line[len("RESULT "):]))

    losses = sorted(o["loss"] for o in outs)
    assert np.isfinite(losses).all()
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # Single-process reference over the SAME global batch on the 8-device mesh.
    import jax
    import jax.numpy as jnp

    from aiic_tpu.adapters import LoRAConfig, init_text_lora
    from aiic_tpu.models import TINY_TEST, init_clip_params
    from aiic_tpu.parallel import create_mesh, shard_train_step
    from aiic_tpu.parallel.multihost import host_local_batch
    from aiic_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    config = TINY_TEST
    tcfg = TrainConfig(epochs=1, batch_size=8, rank=2, alpha=4,
                       attach=("c_fc", "c_proj", "out_proj"))
    params = init_clip_params(jax.random.PRNGKey(0), config)
    lora = init_text_lora(jax.random.PRNGKey(1), config, LoRAConfig(2, 4, tcfg.attach))
    opt = make_optimizer(tcfg, steps_per_epoch=1)
    opt_state = opt.init(lora)
    train_step, eval_step = make_train_step(config, tcfg, opt)
    mesh = create_mesh(8, tp=2)
    jt, _, sp, sl, so = shard_train_step(mesh, train_step, eval_step, params, lora, opt_state)

    rng = np.random.default_rng(0)
    g_pixels = rng.standard_normal((8, config.image_size, config.image_size, 3)).astype(np.float32)
    g_tokens = rng.integers(1, config.vocab_size - 2, (8, config.context_length)).astype(np.int32)
    g_tokens[:, 0] = config.vocab_size - 2
    g_tokens[:, -1] = config.vocab_size - 1
    loss, _, _ = jt(sp, sl, so, host_local_batch(mesh, g_pixels),
                    host_local_batch(mesh, g_tokens), jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss), losses[0], rtol=1e-5)


def test_single_process_seam_is_identity(tmp_path):
    """host_local_batch under one process == plain ('data',) device_put."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aiic_tpu.parallel import create_mesh
    from aiic_tpu.parallel.multihost import global_batch_size, host_local_batch, replicated

    mesh = create_mesh(8, tp=2)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = host_local_batch(mesh, x)
    assert arr.shape == (8, 3)
    assert arr.sharding == NamedSharding(mesh, P("data"))
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert global_batch_size(mesh, 8) == 8

    r = replicated(mesh, x)
    assert r.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(r), x)


def test_process_local_rows_disjoint_shards(monkeypatch):
    """Each process gets a disjoint global_batch/process_count shard; the
    union reconstructs the global batch exactly once (feeding the full batch
    from every process would duplicate rows — and duplicates are labeled
    negatives under the contrastive loss)."""
    import aiic_tpu.parallel.multihost as mh

    rows = np.arange(32)
    monkeypatch.setattr(mh.jax, "process_count", lambda: 4)
    seen = []
    for p in range(4):
        monkeypatch.setattr(mh.jax, "process_index", lambda p=p: p)
        shard = mh.process_local_rows(rows)
        assert len(shard) == 8
        seen.extend(shard.tolist())
    assert sorted(seen) == rows.tolist()

    with pytest.raises(ValueError):
        monkeypatch.setattr(mh.jax, "process_count", lambda: 5)
        mh.process_local_rows(rows)

    # single process: identity
    monkeypatch.setattr(mh.jax, "process_count", lambda: 1)
    np.testing.assert_array_equal(mh.process_local_rows(rows), rows)
