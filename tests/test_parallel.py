"""Multi-device tests on the 8-virtual-CPU mesh: sharded inference and a full
sharded LoRA train step (dp×tp), checking numerics match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aiic_tpu.adapters import LoRAConfig, init_text_lora
from aiic_tpu.models import TINY_TEST, init_clip_params
from aiic_tpu.models.clip import encode_image, normalize_features
from aiic_tpu.parallel import create_mesh, mesh_shape_for, shard_params, shard_train_step
from aiic_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

CFG = TINY_TEST


def test_mesh_shape_factoring():
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(8, tp=4) == (2, 4)
    assert mesh_shape_for(1) == (1, 1)
    assert mesh_shape_for(2) == (2, 1)
    with pytest.raises(ValueError):
        mesh_shape_for(6, tp=4)


def test_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    tcfg = TrainConfig(epochs=2, batch_size=8, rank=2, alpha=4, attach=("c_fc", "c_proj", "out_proj"))
    lora = init_text_lora(jax.random.PRNGKey(1), CFG, LoRAConfig(2, 4, tcfg.attach))
    opt = make_optimizer(tcfg, steps_per_epoch=4)
    opt_state = opt.init(lora)
    train_step, eval_step = make_train_step(CFG, tcfg, opt)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((8, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    tokens = rng.integers(1, CFG.vocab_size - 2, (8, CFG.context_length)).astype(np.int32)
    tokens[:, 0] = CFG.vocab_size - 2
    tokens[:, -1] = CFG.vocab_size - 1
    return params, lora, opt, opt_state, train_step, eval_step, pixels, tokens


def test_sharded_image_encode_matches_single_device(setup):
    params = setup[0]
    pixels = setup[6]
    ref = np.asarray(normalize_features(encode_image(params, jnp.asarray(pixels), CFG)))

    mesh = create_mesh(8, tp=2)
    with mesh:
        sp = shard_params(params, mesh)
        out = np.asarray(normalize_features(encode_image(sp, jnp.asarray(pixels), CFG)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("tp", [1, 2, 4])
def test_sharded_train_step_matches_single_device(setup, tp):
    params, lora, opt, opt_state, train_step, eval_step, pixels, tokens = setup
    # Fresh copies: shard_train_step donates its inputs, and device_put may
    # alias host buffers on CPU — don't let donation eat the fixture arrays.
    lora = jax.tree.map(jnp.array, lora)
    opt_state = jax.tree.map(lambda x: jnp.array(x) if hasattr(x, "shape") else x, opt_state)

    # single-device reference
    ref_loss, ref_lora, _ = jax.jit(train_step)(
        params, lora, opt_state, jnp.asarray(pixels), jnp.asarray(tokens),
        jax.random.PRNGKey(0)
    )

    mesh = create_mesh(8, tp=tp)
    jt, je, sp, sl, so = shard_train_step(mesh, train_step, eval_step, params, lora, opt_state)
    loss, new_lora, new_opt = jt(sp, sl, so, jnp.asarray(pixels), jnp.asarray(tokens),
                                  jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_lora), jax.tree.leaves(new_lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # second step runs (donated buffers, opt state threading)
    loss2, _, _ = jt(sp, new_lora, new_opt, jnp.asarray(pixels), jnp.asarray(tokens),
                     jax.random.PRNGKey(1))
    assert np.isfinite(float(loss2))


def test_grads_flow_only_through_lora(setup):
    """The backbone must be untouched by training by construction."""
    params, lora, opt, opt_state, train_step, _, pixels, tokens = setup
    before = jax.tree.map(np.asarray, params)
    _, new_lora, _ = jax.jit(train_step)(
        params, lora, opt_state, jnp.asarray(pixels), jnp.asarray(tokens),
        jax.random.PRNGKey(0)
    )
    after = jax.tree.map(np.asarray, params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    # adapters did move
    moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(new_lora))
    )
    assert moved


def test_sharded_classify_matches_single_device():
    """Multi-chip data-parallel inference (make_sharded_classify_fn)."""
    import functools

    from aiic_tpu.engine.programs import classify_batch
    from aiic_tpu.parallel import make_sharded_classify_fn

    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((8, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    det = rng.standard_normal((40, CFG.embed_dim)).astype(np.float32)
    det /= np.linalg.norm(det, axis=-1, keepdims=True)
    cat = rng.standard_normal((2, 6, CFG.embed_dim)).astype(np.float32)
    mask = np.ones((2, 6), bool)

    fn = functools.partial(
        classify_batch, config=CFG, interior_count=11, dtype=jnp.float32,
        attn_impl="xla", topk=5,
    )
    def wrapped(params, pixels, det_text, cat_text, cat_mask):
        return fn(params, pixels, det_text, cat_text, cat_mask)

    ref = jax.jit(wrapped)(params, jnp.asarray(pixels), jnp.asarray(det),
                           jnp.asarray(cat), jnp.asarray(mask))

    mesh = create_mesh(8, tp=2)
    sharded = make_sharded_classify_fn(mesh, wrapped, params)
    out = sharded(shard_params(params, mesh), jnp.asarray(pixels), jnp.asarray(det),
                  jnp.asarray(cat), jnp.asarray(mask))
    for key in ("interior_mass", "top_conf", "topk_vals"):
        np.testing.assert_allclose(np.asarray(out[key]), np.asarray(ref[key]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["top_idx"]), np.asarray(ref["top_idx"]))
