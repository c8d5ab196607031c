"""End-to-end verify slice (see .claude/skills/verify): real LoRA ckpt ->
fold -> preprocess real JPEG -> encode_image/encode_text -> softmax probs,
on whatever backend is default (the real TPU chip under axon)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aiic_tpu.adapters import LoRAConfig, lora_tree_from_pth
from aiic_tpu.adapters.lora import fold_text_lora
from aiic_tpu.data.preprocess import preprocess_pil, preprocess_numpy, resize_target
from aiic_tpu.data.tokenizer import tokenize
from aiic_tpu.models import VIT_B_16, init_clip_params
from aiic_tpu.models.clip import encode_image, encode_text

print("backend:", jax.default_backend(), jax.devices())

config = VIT_B_16
params = init_clip_params(jax.random.PRNGKey(0), config)

ckpt = "/root/reference/lora_models/comprehensive_lora.pth"
tree, meta = lora_tree_from_pth(ckpt, config, LoRAConfig(4, 8, ("c_fc", "c_proj")))
print("lora loaded:", meta["loaded"], "keys")
params = fold_text_lora(params, tree, scaling=8 / 4)

from PIL import Image

img = Image.open("/root/reference/dataset_images/interior1.jpg")
print("image size:", img.size, "-> resize_target:", resize_target(*img.size, 224))
px_pil = preprocess_pil(img)
px_np = preprocess_numpy(np.asarray(img.convert("RGB")))
print("pil-vs-matrix preprocess max abs diff:", float(np.abs(px_pil - px_np).max()))

pixels = jnp.asarray(px_pil[None])
tokens = jnp.asarray(tokenize(["a photo of a living room", "a photo of a dog"]))

ef = jax.jit(lambda p, x: encode_image(p, x, config=config))
tf = jax.jit(lambda p, t: encode_text(p, t, config=config))
im = ef(params, pixels)
tx = tf(params, tokens)
im = im / jnp.linalg.norm(im, axis=-1, keepdims=True)
tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
probs = jax.nn.softmax(100.0 * im @ tx.T, axis=-1)
p = np.asarray(probs)
print("probs:", p)
assert np.isfinite(p).all() and abs(p.sum() - 1.0) < 1e-3
print("VERIFY SLICE OK")
