"""Weight (de)serialization and config-aware tokenization tests."""

import jax
import numpy as np

from aiic_tpu.data.tokenizer import VOCAB_SIZE, tokenize, tokenize_for_model
from aiic_tpu.models import TINY_TEST, VIT_B_16, init_clip_params
from aiic_tpu.models.init import flatten_params, save_clip_weights, unflatten_params


def test_npz_roundtrip(tmp_path):
    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    path = str(tmp_path / "w.npz")
    save_clip_weights(params, path)
    back = unflatten_params(dict(np.load(path)))
    assert jax.tree.structure(back) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flatten_keys_are_paths():
    params = {"a": {"b": np.zeros(2), "c": np.ones(3)}}
    flat = flatten_params(params)
    assert set(flat) == {"a/b", "a/c"}


def test_tokenize_for_model_full_vocab_passthrough():
    a = tokenize(["hello world"])
    b = tokenize_for_model(["hello world"], VIT_B_16)
    np.testing.assert_array_equal(a, b)


def test_tokenize_for_model_tiny_vocab_invariants():
    out = tokenize_for_model(["wnętrze w stylu boho"], TINY_TEST)
    v, ctx = TINY_TEST.vocab_size, TINY_TEST.context_length
    assert out.shape == (1, ctx)
    assert out.max() == v - 1            # EOT present and is max id
    assert out[0, 0] == v - 2            # SOT pinned
    assert (out >= 0).all() and (out < v).all()
    # EOT appears exactly once
    assert (out == v - 1).sum() == 1
