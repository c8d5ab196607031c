"""LoRA contrastive fine-tuning on TPU.

Reference training loop (train_lora.py:167-303) re-expressed as a jitted
``value_and_grad`` step over the **adapter tree only** — the backbone never
receives gradients by construction (it is closed over / an untouched input),
which is the JAX-native form of the reference's "train only params with
'lora' in name" selection (train_lora.py:194-197).

Faithful semantics:
- frozen image tower: features under ``stop_gradient`` (ref: no_grad at
  train_lora.py:232-234);
- text tower with LoRA threaded through the scan;
- symmetric InfoNCE with diagonal labels at ``logit_scale.exp()``
  (train_lora.py:241-246), ``logit_scale`` itself frozen;
- AdamW(lr=1e-4, weight_decay=0.01) on adapters, global-norm clip 1.0,
  cosine-annealed lr per epoch (train_lora.py:212-216, 251, 281);
- 90/10 random split, random prompt choice per item per visit
  (train_lora.py:152, 186-188);
- best-val-loss checkpoint of the adapters only (train_lora.py:289-300),
  written both as a torch-compatible ``.pth`` and a native ``.npz``.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aiic_tpu.adapters import LoRAConfig, init_text_lora, save_lora_pth
from aiic_tpu.adapters.torch_convert import lora_tree_to_pth_dict
from aiic_tpu.data.dataset import build_training_prompts, load_training_data
from aiic_tpu.data.preprocess import preprocess_pil
from aiic_tpu.data.tokenizer import tokenize_for_model
from aiic_tpu.models.clip import encode_image, encode_text, normalize_features
from aiic_tpu.models.config import CLIPConfig, VIT_B_16

Params = Dict[str, Any]


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 20
    batch_size: int = 8
    lr: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    rank: int = 16
    alpha: int = 32
    val_fraction: float = 0.1
    seed: int = 0
    # The reference trainer wraps out_proj too (train_lora.py:81-84); its
    # adapters are dead there (SURVEY.md §2c item 3) but alive here, since our
    # attention actually routes through them. Default to the trainable set.
    attach: Tuple[str, ...] = ("c_fc", "c_proj", "out_proj")
    # Dropout on the LoRA delta, train-time only (reference LoRALayer's
    # nn.Dropout, train_lora.py:16-29; reference default 0.0 — the only
    # regularizer the reference has).
    lora_dropout: float = 0.0
    dtype: Any = jnp.float32
    # Text tower attention for the differentiated branch. "auto" resolves to
    # "pallas_vjp" on TPU (Pallas forward + XLA-derived backward via
    # ops/attention.fused_attention_qkv_vjp — the core has no parameters, so
    # the custom VJP is exact for the XLA composition) and "xla" elsewhere.
    attn_impl: str = "auto"
    # Rematerialize each text block in the backward pass instead of stashing
    # per-layer residuals through the scan (measured −8 ms/step at B=256:
    # the dynamic-update-slice stash traffic costs more than the recompute).
    remat_text: bool = True
    # The FROZEN image tower needs no VJP at all — nothing differentiated
    # enters it (params are a non-diff input, pixels are data), so it can run
    # the fused Pallas kernels. None = 'auto' (Pallas on TPU). Under a mesh
    # the tower runs inside a shard_map over ('data',) with replicated
    # visual weights, so the kernels stay live multi-chip.
    image_attn_impl: Any = None
    # Run the frozen image tower with the SERVING numerics: bf16 + int8
    # MLP/attention-projection weights (ops/quant.quantize_model). Adapters
    # then train against exactly the image features the int8 serving config
    # produces, instead of fp32 features it will never see again. Works on
    # one device and under a mesh (shard_map keeps the int8 custom calls
    # per-device).
    quantize_image: bool = False
    # Run the DIFFERENTIATED text tower with the serving int8 numerics too,
    # via the whole-block int8 kernel pair (ops/block_grad int8 variant:
    # int8 backbone matmuls in forward AND backward under the
    # straight-through estimator, LoRA deltas bf16). Requires
    # attn_impl="block_fused"; forces bf16 text compute. The serving engine
    # precomputes text features through the int8 kernels, so this trains
    # adapters against the numerics actually deployed — and double-pumps the
    # backbone MACs.
    quantize_text: bool = False
    # The frozen image tower + deterministic preprocessing (the reference
    # has NO train-time augmentation, train_lora.py:121-161) make per-image
    # features CONSTANT for the entire run. With this on (default),
    # train_lora computes each image's features exactly ONCE through the
    # trainer's real image branch (quantize_image / mesh included) and every
    # train/eval step consumes the cached table — a text-only step with a
    # bit-identical loss trajectory at roughly the serving throughput. The
    # reference recomputes the frozen tower every step under no_grad
    # (train_lora.py:232-234) because torch eager makes that the natural
    # form; caching is the TPU-native form of the same semantics.
    # Auto-disabled under multi-process runs (the table is host-gathered).
    cache_image_features: bool = True
    # The prompt pool is tiny (1-4 template strings per item,
    # train_lora.py:129-137) while TPU-native batches are large, so a
    # B=1024 batch contains the same few dozen token rows over and over.
    # With this on (default), the step encodes the GLOBAL unique-prompt
    # pool once ([P, 77], a compile-time constant) and gathers each row's
    # feature by index — mathematically identical loss and gradients (the
    # text tower is row-independent; duplicate rows' cotangents sum by
    # linearity), at pool-sized instead of batch-sized text-tower work.
    # Engages only when P <= batch_size (otherwise dense is cheaper) and
    # lora_dropout == 0 (a shared dropout mask across duplicates would
    # change the reference semantics).
    dedup_prompts: bool = True


def contrastive_loss(
    img_feats: jnp.ndarray, txt_feats: jnp.ndarray, logit_scale: jnp.ndarray
) -> jnp.ndarray:
    """Symmetric InfoNCE with diagonal labels (train_lora.py:241-246)."""
    scale = jnp.exp(logit_scale)
    logits = scale * img_feats @ txt_feats.T
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return (li + lt) / 2.0


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW + cosine annealing stepped per epoch (matches torch
    CosineAnnealingLR(T_max=epochs) + scheduler.step() per epoch)."""

    def lr_schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return cfg.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / cfg.epochs))

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(learning_rate=lr_schedule, weight_decay=cfg.weight_decay),
    )


def make_train_step(
    config: CLIPConfig,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
    cached_image: bool = False,
    prompt_pool: Optional[np.ndarray] = None,
) -> Callable:
    """Jittable (params, lora, opt_state, pixels, tokens) -> (loss, lora, opt_state).

    ``cached_image=True``: the 4th step argument is a precomputed
    ``[batch, embed_dim]`` image-feature table slice (as produced by
    ``train_step.image_features``) instead of raw pixels — the text-only
    step behind ``TrainConfig.cache_image_features``. The batch-leading
    layout is unchanged, so ``shard_train_step``'s ('data',) input sharding
    applies as-is.

    ``prompt_pool``: a ``[P, context_length]`` token table of the run's
    UNIQUE prompts (TrainConfig.dedup_prompts). The step's 5th argument then
    becomes a ``[batch]`` int32 vector of pool indices instead of a
    ``[batch, context_length]`` token matrix: the text tower encodes the
    pool once per step (it is a compile-time constant) and the loss gathers
    per-row features — identical numerics at pool-sized text work. Requires
    ``cfg.lora_dropout == 0`` (duplicates would share a dropout mask).

    ``params`` is a non-differentiated input (frozen backbone); only the
    adapter tree flows through ``value_and_grad``.

    The train step takes a trailing ``rng`` (dropout key). With
    ``cfg.lora_dropout == 0`` (the reference default) the key is unused and
    the math is bit-identical to a step without it; eval never drops.

    ``mesh``: when given, the FROZEN image tower runs inside a
    ``jax.shard_map`` over the ('data',) axis with replicated visual
    weights — each device executes the single-chip program (Pallas / int8
    kernels included) on its local batch shard. This is how multi-chip
    training keeps the fast image forward (GSPMD cannot partition the
    Pallas custom calls, but the frozen tower is embarrassingly
    data-parallel). The DIFFERENTIATED text tower does the same when a
    kernel impl is selected (pallas_vjp / block_fused / block_fused_int8):
    per-shard tower inside a shard_map, global contrastive loss outside on
    the sharded feature rows, adapter gradients psum'd by the shard_map
    transpose — pair with ``shard_train_step(..., replicate_visual=True,
    replicate_text=True)``. With ``attn_impl='xla'`` the text tower stays
    on the GSPMD path instead, which also admits TP-sharded text weights.
    """
    scaling = cfg.alpha / cfg.rank
    image_impl = cfg.image_attn_impl if cfg.image_attn_impl is not None else "auto"
    # Serving-numerics image tower: the int8 kernels only engage on the bf16
    # path (models.clip.block), so the frozen branch switches dtype; the
    # differentiated text branch keeps cfg.dtype.
    image_dtype = jnp.bfloat16 if cfg.quantize_image else cfg.dtype
    text_impl = cfg.attn_impl
    if text_impl == "auto":
        # pallas_vjp is a custom call GSPMD cannot partition, so "auto"
        # selects it on a TPU backend either single-device or under a mesh
        # (where the text tower runs inside a shard_map over ('data',) with
        # replicated weights — see text_features below). Multi-device
        # WITHOUT a mesh resolves to the shardable XLA path.
        single_device = jax.device_count() == 1
        text_impl = ("pallas_vjp"
                     if jax.default_backend() == "tpu"
                     and (single_device or mesh is not None)
                     else "xla")
    text_remat = cfg.remat_text
    if text_impl == "block_fused":
        # The kernel only engages under its preconditions (full reference
        # attach set, no dropout, quick-gelu — models.clip.block); mirror
        # them here so a silent fallback to autodiff keeps remat ON instead
        # of stashing 12 layers of activations. One additional gate lives
        # only here: the whole-block VMEM plan (wide towers run the kernels
        # hidden-axis-CHUNKED — ops/block_grad text_block_plan; geometries
        # with no plan at all would die in Mosaic allocation and fall back
        # here instead). A mesh is NOT a blocker: the kernel text tower
        # runs inside a shard_map over ('data',) with replicated weights
        # (text_features below), the same way the frozen image tower keeps
        # its Pallas/int8 kernels multi-chip.
        from aiic_tpu.ops.block_grad import text_block_supported

        kernel_ok = (
            cfg.lora_dropout == 0.0
            and all(k in cfg.attach for k in ("out_proj", "c_fc", "c_proj"))
            and config.gelu_type == "quick_gelu"
            and text_block_supported(
                config.context_length, config.text.width,
                config.text.mlp_dim, config.text.heads,
                jnp.dtype(cfg.dtype).itemsize)
        )
        if kernel_ok:
            # The whole-block custom VJP already embodies the recompute
            # trade (ops/block_grad); wrapping it in jax.checkpoint would
            # just replay the forward a third time.
            text_remat = False
            if cfg.quantize_text:
                from aiic_tpu.ops.block_grad import text_block_int8_supported

                if text_block_int8_supported(
                        config.context_length, config.text.width,
                        config.text.mlp_dim, config.text.heads):
                    text_impl = "block_fused_int8"
        else:
            text_impl = ("pallas_vjp"
                         if jax.default_backend() == "tpu"
                         and (jax.device_count() == 1 or mesh is not None)
                         else "xla")
    if cfg.quantize_text and text_impl != "block_fused_int8":
        # Fail loudly: the flag exists to train adapters against the int8
        # serving numerics; silently falling back to bf16 gradients would
        # ship adapters trained against numerics the deployed int8 engine
        # never reproduces — the exact mismatch the flag closes.
        raise ValueError(
            "quantize_text requires the int8 whole-block text kernel, which "
            f"was not selected (resolved attn_impl={text_impl!r}). It needs "
            "attn_impl='block_fused', the full reference attach set, "
            "lora_dropout=0, quick-gelu, and a text tower that fits "
            "the kernel's VMEM budget "
            "(ops/block_grad.text_block_int8_supported)."
        )

    def _image_branch(visual, pixels):
        return normalize_features(
            encode_image({"visual": visual}, pixels, config,
                         dtype=image_dtype, attn_impl=image_impl)
        ).astype(cfg.dtype)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        # Per-device single-chip image program on the local batch shard;
        # visual weights replicated (in_specs P()). Only the visual subtree
        # enters the shard_map, so TP-sharded text weights are untouched.
        _image_fn = jax.shard_map(
            _image_branch, mesh=mesh,
            in_specs=(P(), P("data")), out_specs=P("data"),
            check_vma=False,  # Pallas custom calls defeat the rep checker
        )
    else:
        _image_fn = _image_branch

    def image_features(params, pixels):
        """The frozen-tower branch exactly as the loss sees it (exposed as
        ``train_step.image_features`` so tests can pin the trainer's image
        numerics — e.g. that quantize_image really runs the int8 serving
        path — without reaching into the closure)."""
        return _image_fn(params["visual"], pixels)

    # The int8 text kernel runs the serving composition, whose compute
    # dtype is bf16 (int8 MACs + bf16 core); plain cfg.dtype otherwise.
    text_dtype = jnp.bfloat16 if text_impl == "block_fused_int8" else cfg.dtype

    def _text_branch(lora_tree, params, token_rows, rng=None):
        return normalize_features(
            encode_text(
                params, token_rows, config, dtype=text_dtype,
                attn_impl=text_impl, lora=lora_tree, lora_scaling=scaling,
                lora_dropout=cfg.lora_dropout if rng is not None else 0.0,
                lora_rng=rng, remat=text_remat,
            )
        )

    if mesh is not None and text_impl in (
            "pallas_vjp", "block_fused", "block_fused_int8"):
        # The DIFFERENTIATED text tower under a mesh, kernels kept: each
        # device runs the single-chip program (Pallas custom VJPs included)
        # on its local token rows with replicated weights + adapters, pure
        # data parallelism over ('data',). shard_map is differentiable —
        # the transpose of the replicated adapter in_spec is a psum over
        # the mesh, so value_and_grad over the global contrastive loss
        # (computed OUTSIDE the shard_map on the P('data')-sharded feature
        # rows) yields exactly the single-device gradient; verified to 1e-5
        # against the unsharded step in tests/test_parallel.py. Kernel
        # paths require lora_dropout == 0, so no rng crosses the boundary.
        from jax.sharding import PartitionSpec as P

        _text_sm = jax.shard_map(
            lambda lt, p, t: _text_branch(lt, p, t),
            mesh=mesh, in_specs=(P(), P(), P("data")), out_specs=P("data"),
            check_vma=False,  # Pallas custom calls defeat the rep checker
        )
        _n_data = mesh.shape["data"]

        def text_features(lora_tree, params, token_rows, rng=None):
            # Pad rows to the data-axis multiple (the prompt pool's size is
            # data-dependent); padded rows cost one tower pass each and are
            # sliced off before the loss ever sees them.
            rows = token_rows.shape[0]
            pad = (-rows) % _n_data
            if pad:
                token_rows = jnp.concatenate(
                    [token_rows,
                     jnp.zeros((pad,) + token_rows.shape[1:],
                               token_rows.dtype)])
            out = _text_sm(lora_tree, params, token_rows)
            return out[:rows] if pad else out
    else:
        text_features = _text_branch

    if prompt_pool is not None and cfg.lora_dropout > 0.0:
        raise ValueError(
            "prompt_pool (dedup_prompts) requires lora_dropout == 0: a "
            "deduplicated row would share one dropout mask across its "
            "duplicates, changing the reference per-row-dropout semantics"
        )
    pool_tokens = None if prompt_pool is None else jnp.asarray(prompt_pool)

    def loss_fn(lora_tree, params, batch_x, tokens, rng=None):
        # batch_x: pixels normally; a precomputed feature slice when
        # cached_image (already normalized/astype by image_features).
        # tokens: [B, context] token rows normally; [B] pool indices when
        # prompt_pool is set.
        img = jax.lax.stop_gradient(
            batch_x.astype(cfg.dtype) if cached_image
            else image_features(params, batch_x)
        )
        txt = text_features(
            lora_tree, params,
            tokens if pool_tokens is None else pool_tokens, rng,
        )
        if pool_tokens is not None:
            txt = txt[tokens]
        return contrastive_loss(img, txt, params["logit_scale"])

    def train_step(params, lora_tree, opt_state, batch_x, tokens, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            lora_tree, params, batch_x, tokens,
            rng if cfg.lora_dropout > 0.0 else None,
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora_tree)
        lora_tree = optax.apply_updates(lora_tree, updates)
        return loss, lora_tree, opt_state

    def eval_step(params, lora_tree, batch_x, tokens):
        return loss_fn(lora_tree, params, batch_x, tokens)

    train_step.image_features = image_features
    # Resolved text implementation (callers pick shard_train_step's
    # replicate_text from it: kernel paths need replicated text weights).
    train_step.text_impl = eval_step.text_impl = text_impl
    return train_step, eval_step


# ---------------------------------------------------------------------------
# Host-side data plumbing
# ---------------------------------------------------------------------------


class PromptedImageDataset:
    """(image tensor, random-prompt tokens) pairs from the dataset JSON
    (reference InteriorStyleDataset, train_lora.py:121-161)."""

    def __init__(self, training_data, config: CLIPConfig, image_root: str = "."):
        self.config = config
        self.items = []
        for item in training_data:
            self.items.append((item["image_path"], build_training_prompts(item)))
        self.image_root = image_root
        self._cache: Dict[str, np.ndarray] = {}
        # Global unique-prompt pool (first-occurrence order) + per-item
        # prompt->pool-id lists, for TrainConfig.dedup_prompts.
        pool_index: Dict[str, int] = {}
        self.prompt_pool: list = []
        self._item_pool_ids: list = []
        for _, prompts in self.items:
            ids = []
            for p in prompts:
                if p not in pool_index:
                    pool_index[p] = len(self.prompt_pool)
                    self.prompt_pool.append(p)
                ids.append(pool_index[p])
            self._item_pool_ids.append(ids)

    def __len__(self):
        return len(self.items)

    def load_pixels(self, idx: int) -> np.ndarray:
        path, _ = self.items[idx]
        if path not in self._cache:
            from PIL import Image

            full = path if os.path.isabs(path) else os.path.join(self.image_root, path)
            try:
                img = Image.open(full).convert("RGB")
                self._cache[path] = preprocess_pil(img, self.config.image_size)
            except Exception:
                # Reference fallback: zero image + "wnętrze" prompt
                # (train_lora.py:156-161).
                self._cache[path] = np.zeros(
                    (self.config.image_size, self.config.image_size, 3), np.float32
                )
        return self._cache[path]

    def batch_tokens(self, indices, rng: np.random.Generator) -> np.ndarray:
        """One random-prompt draw per index (train_lora.py:186-188) — the
        exact rng consumption of ``batch``, so the feature-cached path
        replays the identical prompt sequence."""
        texts = []
        for i in indices:
            prompts = self.items[i][1]
            texts.append(prompts[int(rng.integers(0, len(prompts)))])
        return tokenize_for_model(texts, self.config)

    def batch_prompt_ids(self, indices, rng: np.random.Generator) -> np.ndarray:
        """Pool index of one random-prompt draw per row — the SAME
        ``rng.integers(0, len(prompts))`` consumption as ``batch_tokens``,
        so the dedup path replays the identical prompt sequence."""
        ids = []
        for i in indices:
            ids.append(self._item_pool_ids[i][int(
                rng.integers(0, len(self.items[i][1])))])
        return np.asarray(ids, np.int32)

    def batch(self, indices, rng: np.random.Generator):
        pixels = np.stack([self.load_pixels(i) for i in indices])
        return pixels, self.batch_tokens(indices, rng)


def precompute_image_features(
    image_features_fn: Callable,
    params: Params,
    ds: "PromptedImageDataset",
    batch: int,
    place_batch: Callable = jnp.asarray,
) -> np.ndarray:
    """[len(ds), embed_dim] table of the trainer's EXACT image-branch output
    (normalized, cfg.dtype) computed once per image — valid for the whole run
    because the tower is frozen and preprocessing is deterministic (the
    reference has no train-time augmentation, train_lora.py:121-161).

    The tower runs once per unique image PATH (datasets may repeat files —
    e.g. replicated rows or multi-prompt corpora); rows sharing a path share
    the computed feature. Unique-path indices are padded by cycling so every
    device batch keeps the training batch shape (static shapes for XLA;
    ('data',)-divisibility under a mesh); pad duplicates just overwrite
    themselves with identical values."""
    import time

    jfn = jax.jit(image_features_fn)
    n = len(ds)
    path_to_uid: Dict[str, int] = {}
    row_uid = np.empty(n, np.int64)
    uniq_rows = []
    for i, (path, _) in enumerate(ds.items):
        if path not in path_to_uid:
            path_to_uid[path] = len(uniq_rows)
            uniq_rows.append(i)
        row_uid[i] = path_to_uid[path]
    idx = np.arange(len(uniq_rows))
    pad = (-len(idx)) % batch
    if pad:
        # np.resize cycles — pad can exceed len(idx) when the unique-image
        # count is below half the batch (e.g. 150 uniques at batch 1024).
        idx = np.concatenate([idx, np.resize(idx, pad)])
    t0 = time.perf_counter()
    out = None
    for i in range(0, len(idx), batch):
        sl = idx[i : i + batch]
        pixels = np.stack([ds.load_pixels(uniq_rows[int(j)]) for j in sl])
        f = np.asarray(jfn(params, place_batch(pixels)))
        if out is None:
            out = np.zeros((len(uniq_rows), f.shape[-1]), f.dtype)
        out[sl] = f
    precompute_image_features.last_seconds = time.perf_counter() - t0
    precompute_image_features.unique_images = len(uniq_rows)
    return out[row_uid]


def train_lora(
    json_path: str = "interior_dataset.json",
    save_path: str = "lora_models/comprehensive_lora_improved.pth",
    *,
    params: Optional[Params] = None,
    config: CLIPConfig = VIT_B_16,
    cfg: Optional[TrainConfig] = None,
    image_root: Optional[str] = None,
    mesh=None,
    resume: bool = False,
    log: Callable[[str], None] = print,
) -> Dict[str, Any]:
    """Full training run. Returns {best_val_loss, lora_tree, history}.

    ``resume=True`` continues from ``{save_path}.state.npz`` (full state:
    adapters + optimizer + epoch + best-val — the resume capability the
    reference lacks, SURVEY.md §5d)."""
    from aiic_tpu.models.init import init_clip_params

    cfg = cfg or TrainConfig()
    # Kernel text impls (pallas_vjp / block_fused / the int8 variant) run
    # under a mesh inside make_train_step's shard_map over ('data',) with
    # replicated text weights — no special-casing needed here; the step
    # exposes the resolved impl as train_step.text_impl and shard_train_step
    # is told to replicate accordingly below.
    if params is None:
        params = init_clip_params(jax.random.PRNGKey(cfg.seed), config)

    if cfg.quantize_image or cfg.quantize_text:
        from aiic_tpu.ops.quant import quantize_model_mlp

        # int8 weights on the selected towers. quantize_image: the FROZEN
        # tower runs the serving int8 kernels (works under a mesh too — it
        # runs inside shard_map over ('data',) with replicated weights).
        # quantize_text: the DIFFERENTIATED tower's backbone weights go
        # int8 for the whole-block int8 train kernel (block_fused only,
        # single device).
        towers = tuple(
            t for t, on in (("visual", cfg.quantize_image),
                            ("text", cfg.quantize_text)) if on)
        params = quantize_model_mlp(params, attn=True, towers=towers)

    if image_root is None:
        image_root = os.path.dirname(os.path.abspath(json_path))
    data = load_training_data(json_path)
    ds = PromptedImageDataset(data, config, image_root=image_root)

    rng = np.random.default_rng(cfg.seed)
    order = rng.permutation(len(ds))
    n_val = max(1, int(len(ds) * cfg.val_fraction))
    val_idx, train_idx = order[:n_val], order[n_val:]
    steps_per_epoch = max(1, len(train_idx) // cfg.batch_size)

    lora_cfg = LoRAConfig(rank=cfg.rank, alpha=cfg.alpha, attach=cfg.attach)
    lora_tree = init_text_lora(jax.random.PRNGKey(cfg.seed), config, lora_cfg)

    optimizer = make_optimizer(cfg, steps_per_epoch)
    opt_state = optimizer.init(lora_tree)

    start_epoch = 0
    best_val = float("inf")
    resume_step = 0
    state_path = (save_path + ".state.npz") if save_path else None
    if resume and state_path and os.path.exists(state_path):
        from aiic_tpu.train.checkpoint import load_train_state

        lora_tree, opt_state, meta = load_train_state(state_path, lora_tree, opt_state)
        start_epoch = int(meta["epoch"]) + 1
        best_val = float(meta["best_val_loss"])
        # Replay-identical resume: restore the data-order rng where the
        # checkpointed run left it, so the resumed run consumes the SAME
        # permutations/prompt draws the uninterrupted run would have
        # (tested: test_resume_matches_uninterrupted_run). Old state files
        # without rng_state keep the legacy re-seeded behavior.
        if "rng_state" in meta:
            rng.bit_generator.state = meta["rng_state"]
            resume_step = int(meta.get("step", 0))
        else:
            log("  (state file predates rng persistence: data order will "
                "not replay the uninterrupted run)")
        log(f"resumed from {state_path} at epoch {start_epoch} (best val {best_val:.4f})")

    # Feature-cache training (cfg.cache_image_features): the frozen tower
    # runs ONCE over the dataset, then every step is text-only against the
    # cached table — same loss trajectory, ~2x step throughput. Host-gathered
    # table, so multi-process runs fall back to per-step recompute.
    use_cache = cfg.cache_image_features and jax.process_count() == 1
    # Prompt dedup (cfg.dedup_prompts): encode the global unique-prompt pool
    # once per step and gather rows by index — identical numerics, text-tower
    # work scales with the pool (P) instead of the batch. Only a win when
    # P <= batch; requires no dropout (see TrainConfig).
    pool = ds.prompt_pool
    use_dedup = (cfg.dedup_prompts and cfg.lora_dropout == 0.0
                 and 0 < len(pool) <= cfg.batch_size)
    pool_tokens = tokenize_for_model(pool, config) if use_dedup else None
    train_step, eval_step = make_train_step(
        config, cfg, optimizer, mesh=mesh, cached_image=use_cache,
        prompt_pool=pool_tokens)
    image_features_fn = train_step.image_features
    if use_dedup:
        log(f"prompt dedup: {len(pool)} unique prompts encoded per step "
            f"(vs {cfg.batch_size} dense rows)")

    if mesh is not None:
        from aiic_tpu.parallel.multihost import host_local_batch
        from aiic_tpu.parallel.sharding import shard_train_step

        train_step, eval_step, params, lora_tree, opt_state = shard_train_step(
            mesh, train_step, eval_step, params, lora_tree, opt_state,
            replicate_visual=True,
            # Kernel text impls run inside a shard_map with replicated text
            # weights + adapters; only the XLA path admits TP sharding.
            replicate_text=train_step.text_impl != "xla",
        )
        from aiic_tpu.parallel.multihost import process_local_rows

        # Multi-host DP input seam (SURVEY §2d): each process feeds ONLY its
        # disjoint shard of every global batch (process_local_rows) and
        # host_local_batch assembles the global array; under one process
        # both are identities over plain ('data',) placement.
        place_batch = lambda x: host_local_batch(mesh, x)
        local_rows = process_local_rows
    else:
        train_step = jax.jit(train_step, donate_argnums=(1, 2))
        eval_step = jax.jit(eval_step)
        place_batch = jnp.asarray
        local_rows = lambda x: x

    feats_table = None
    if use_cache:
        feats_table = precompute_image_features(
            image_features_fn, params, ds, cfg.batch_size, place_batch)
        log(f"cached {len(ds)} image features once "
            f"({precompute_image_features.unique_images} unique images, "
            f"{precompute_image_features.last_seconds:.1f}s); "
            "train steps are text-only")

    def make_batch(sl):
        """(image batch, token batch) for the step — cached features or raw
        pixels; pool indices or token rows. rng consumption is identical on
        every path (batch_prompt_ids/batch_tokens make the same per-row
        integers draw batch() does)."""
        rows = local_rows(sl)
        toks = (ds.batch_prompt_ids(rows, rng) if use_dedup
                else ds.batch_tokens(rows, rng))
        if use_cache:
            return feats_table[rows], toks
        return np.stack([ds.load_pixels(int(i)) for i in rows]), toks

    def run_epoch_batches(indices):
        # The permutation is seed-identical on every process; each host then
        # materializes only its local_rows shard of each global batch.
        idx = rng.permutation(indices)
        for i in range(0, len(idx) - cfg.batch_size + 1, cfg.batch_size):
            yield make_batch(idx[i : i + cfg.batch_size])

    history = []
    best_tree = lora_tree
    base_key = jax.random.PRNGKey(cfg.seed)
    step_n = resume_step
    for epoch in range(start_epoch, cfg.epochs):
        train_losses = []
        for pixels, tokens in run_epoch_batches(train_idx):
            step_n += 1
            loss, lora_tree, opt_state = train_step(
                params, lora_tree, opt_state,
                place_batch(pixels), place_batch(tokens),
                jax.random.fold_in(base_key, step_n),
            )
            # Keep the loss as a device scalar: fetching here would hard-sync
            # every step (~30 ms relay RTT each on this backend); deferring
            # the float() to epoch end lets dispatches pipeline.
            train_losses.append(loss)
        train_losses = [float(l) for l in train_losses]
        val_losses = []
        # Fixed-size validation batches (cycle-pad small val sets): static
        # shapes for XLA and divisibility for the sharded ('data',) axis.
        vi = val_idx
        if len(vi) > 0:
            reps = max(1, -(-cfg.batch_size // len(vi)))
            vi_padded = np.tile(vi, reps)
            n_full = max(1, len(vi) // cfg.batch_size)
            for i in range(n_full):
                sl = vi_padded[i * cfg.batch_size : (i + 1) * cfg.batch_size]
                if len(sl) < cfg.batch_size:
                    sl = vi_padded[: cfg.batch_size]
                pixels, tokens = make_batch(sl)
                val_losses.append(
                    eval_step(params, lora_tree, place_batch(pixels), place_batch(tokens))
                )
            val_losses = [float(l) for l in val_losses]
        avg_train = float(np.mean(train_losses)) if train_losses else float("nan")
        avg_val = float(np.mean(val_losses)) if val_losses else avg_train
        history.append({"epoch": epoch + 1, "train_loss": avg_train, "val_loss": avg_val})
        log(f"epoch {epoch + 1}/{cfg.epochs}  train {avg_train:.4f}  val {avg_val:.4f}")

        if avg_val < best_val:
            best_val = avg_val
            best_tree = jax.tree.map(lambda x: np.asarray(x), lora_tree)
            if save_path:
                os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
                save_lora_pth(best_tree, save_path)
                np.savez(
                    save_path + ".npz",
                    **{k: v for k, v in lora_tree_to_pth_dict(best_tree).items()},
                )
                log(f"  saved best adapters (val {avg_val:.4f}) -> {save_path}")

        if state_path:
            from aiic_tpu.train.checkpoint import save_train_state

            save_train_state(
                state_path, lora_tree, opt_state,
                epoch=epoch, best_val_loss=best_val, seed=cfg.seed,
                rng_state=rng.bit_generator.state, step=step_n,
            )

    return {"best_val_loss": best_val, "lora_tree": best_tree, "history": history}
