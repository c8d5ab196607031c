"""Training-loop tests: loss math vs torch semantics, end-to-end run on a
synthetic dataset, checkpoint save format."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiic_tpu.models.config import TINY_TEST
from aiic_tpu.train import TrainConfig, contrastive_loss, train_lora
from aiic_tpu.train.trainer import make_optimizer


def test_contrastive_loss_matches_torch_cross_entropy():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    img = rng.standard_normal((6, 8)).astype(np.float32)
    txt = rng.standard_normal((6, 8)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    logit_scale = np.float32(np.log(1 / 0.07))

    ours = float(contrastive_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(logit_scale)))

    # Reference math (train_lora.py:241-246)
    ti, tt = torch.from_numpy(img), torch.from_numpy(txt)
    logits = (ti @ tt.t()) * torch.tensor(logit_scale).exp()
    labels = torch.arange(6)
    crit = torch.nn.CrossEntropyLoss()
    ref = float((crit(logits, labels) + crit(logits.t(), labels)) / 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cosine_schedule_matches_torch_annealing():
    cfg = TrainConfig(epochs=10, lr=1e-4)
    opt = make_optimizer(cfg, steps_per_epoch=5)
    # lr at epoch boundary e should be lr/2 * (1 + cos(pi e / epochs))
    for epoch in [0, 3, 9]:
        step = epoch * 5
        expect = 1e-4 * 0.5 * (1 + np.cos(np.pi * epoch / 10))
        got = 1e-4 * 0.5 * (1 + np.cos(np.pi * (step // 5) / 10))
        np.testing.assert_allclose(got, expect)


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    items = []
    styles = ["nowoczesny", "klasyczny", "boho"]
    rooms = ["kuchnia", "salon", ""]
    for i in range(24):
        name = f"img{i}.png"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(root / name)
        items.append({
            "image_path": name,
            "style": styles[i % 3],
            "characteristics": ["przestronne", "jasne"][: (i % 3)],
            "materials": ["drewno"],
            "colors": ["biały"],
            "room_type": rooms[i % 3],
        })
    path = root / "dataset.json"
    path.write_text(json.dumps({"training_data": items}), encoding="utf-8")
    return str(path), str(root)


def test_train_lora_end_to_end(synth_dataset, tmp_path):
    json_path, root = synth_dataset
    save = str(tmp_path / "adapters.pth")
    out = train_lora(
        json_path,
        save,
        config=TINY_TEST,
        cfg=TrainConfig(epochs=2, batch_size=8, rank=2, alpha=4, seed=0),
        image_root=root,
        log=lambda *_: None,
    )
    assert np.isfinite(out["best_val_loss"])
    assert len(out["history"]) == 2
    # Adapters actually trained (B moved off zero)
    assert np.abs(np.asarray(out["lora_tree"]["c_fc"]["B"])).max() > 0

    # Checkpoint is torch-loadable with reference key layout
    import torch

    sd = torch.load(save, map_location="cpu", weights_only=True)
    assert "clip_model.transformer.resblocks.0.mlp.c_fc.lora.lora_A" in sd
    assert all(v.dtype == torch.float32 for v in sd.values())
    assert os.path.exists(save + ".npz")

    # And loadable back through the converter at matching rank
    from aiic_tpu.adapters import LoRAConfig, lora_tree_from_pth

    tree, meta = lora_tree_from_pth(
        save, TINY_TEST, LoRAConfig(rank=2, alpha=4, attach=("c_fc", "c_proj", "out_proj"))
    )
    assert meta["loaded"] == len(sd)


def test_lora_dropout_semantics():
    """dropout=0 is bit-identical to the no-dropout step; dropout>0 changes
    the training loss but never folded inference (reference train_lora.py:16-29,
    dropout applies to the low-rank path at train time only)."""
    from aiic_tpu.adapters import LoRAConfig, init_text_lora
    from aiic_tpu.adapters.lora import fold_text_lora
    from aiic_tpu.models import init_clip_params
    from aiic_tpu.models.clip import encode_text
    from aiic_tpu.train.trainer import make_train_step

    config = TINY_TEST
    params = init_clip_params(jax.random.PRNGKey(0), config)
    attach = ("c_fc", "c_proj", "out_proj")
    lora = init_text_lora(jax.random.PRNGKey(1), config, LoRAConfig(2, 4, attach))
    # make adapters non-trivial so dropout has something to mask
    lora = jax.tree.map(lambda x: x + 0.05, lora)

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((4, config.image_size, config.image_size, 3)).astype(np.float32))
    tokens = rng.integers(1, config.vocab_size - 2, (4, config.context_length)).astype(np.int32)
    tokens[:, 0] = config.vocab_size - 2
    tokens[:, -1] = config.vocab_size - 1
    tokens = jnp.asarray(tokens)
    key = jax.random.PRNGKey(7)

    def run(dropout, k):
        cfg = TrainConfig(epochs=1, batch_size=4, rank=2, alpha=4,
                          attach=attach, lora_dropout=dropout)
        opt = make_optimizer(cfg, steps_per_epoch=1)
        step, _ = make_train_step(config, cfg, opt)
        loss, new_lora, _ = jax.jit(step)(
            params, lora, opt.init(lora), pixels, tokens, k)
        return float(loss), new_lora

    loss0a, _ = run(0.0, key)
    loss0b, _ = run(0.0, jax.random.PRNGKey(99))  # key must be inert at 0.0
    assert loss0a == loss0b
    loss_d, _ = run(0.5, key)
    assert loss_d != loss0a  # dropout actually perturbs training

    # Folded inference has no dropout path at all: identical regardless of
    # the train-time dropout setting.
    folded = fold_text_lora(params, lora, scaling=2.0)
    a = np.asarray(encode_text(folded, tokens, config))
    b = np.asarray(encode_text(params, tokens, config, lora=lora, lora_scaling=2.0))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_missing_image_falls_back_to_zero(synth_dataset):
    """Reference train_lora.py:156-161: unreadable image -> zero tensor."""
    from aiic_tpu.train.trainer import PromptedImageDataset

    json_path, root = synth_dataset
    data = [{"image_path": "nope.png", "style": "x", "characteristics": [], "colors": [],
             "materials": [], "room_type": ""}]
    ds = PromptedImageDataset(data, TINY_TEST, image_root=root)
    px = ds.load_pixels(0)
    assert px.shape == (TINY_TEST.image_size, TINY_TEST.image_size, 3)
    assert (px == 0).all()


def test_trained_lora_evaluation(synth_dataset, tmp_path):
    """Retrieval-accuracy evaluation (reference train_lora.py:309-360)."""
    from aiic_tpu.train import test_trained_lora as evaluate

    json_path, root = synth_dataset
    save = str(tmp_path / "a.pth")
    train_lora(
        json_path, save, config=TINY_TEST,
        cfg=TrainConfig(epochs=1, batch_size=8, rank=2, alpha=4, seed=0),
        image_root=root, log=lambda *_: None,
    )
    acc = evaluate(
        json_path, save, config=TINY_TEST, rank=2, alpha=4,
        batch_size=8, image_root=root,
    )
    assert 0.0 <= acc <= 1.0


def test_train_lora_with_mesh(synth_dataset, tmp_path):
    """Full training entry point with a dp x tp mesh (sharded path)."""
    from aiic_tpu.parallel import create_mesh

    json_path, root = synth_dataset
    mesh = create_mesh(8, tp=2)
    out = train_lora(
        json_path, str(tmp_path / "m.pth"), config=TINY_TEST,
        cfg=TrainConfig(epochs=1, batch_size=8, rank=2, alpha=4, seed=0,
                        cache_image_features=False),  # per-step tower path
        image_root=root, mesh=mesh, log=lambda *_: None,
    )
    assert np.isfinite(out["best_val_loss"])
    assert np.abs(np.asarray(out["lora_tree"]["c_fc"]["B"])).max() > 0


def test_train_lora_quantized_image_tower(synth_dataset, tmp_path):
    """quantize_image runs the frozen tower with the serving numerics (bf16 +
    int8 kernels, interpret-mode on CPU): training converges to a finite loss,
    adapters move, and the image features the trainer saw match the int8
    serving path's features (not the fp32 path's)."""
    json_path, root = synth_dataset
    out = train_lora(
        json_path, str(tmp_path / "q.pth"), config=TINY_TEST,
        cfg=TrainConfig(epochs=1, batch_size=8, rank=2, alpha=4, seed=0,
                        quantize_image=True, image_attn_impl="pallas"),
        image_root=root, log=lambda *_: None,
    )
    assert np.isfinite(out["best_val_loss"])
    assert np.abs(np.asarray(out["lora_tree"]["c_fc"]["B"])).max() > 0

    # The trainer's ACTUAL image branch (make_train_step's exposed
    # image_features — the function loss_fn differentiates around) produces
    # the int8 serving path's features, not the fp32 path's.
    from aiic_tpu.models import init_clip_params
    from aiic_tpu.models.clip import encode_image, normalize_features
    from aiic_tpu.ops.quant import quantize_model_mlp
    from aiic_tpu.train.trainer import make_optimizer, make_train_step

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    qparams = quantize_model_mlp(params, attn=True, towers=("visual",))
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal(
        (2, TINY_TEST.image_size, TINY_TEST.image_size, 3)).astype(np.float32))
    serving = normalize_features(encode_image(
        qparams, px, TINY_TEST, dtype=jnp.bfloat16, attn_impl="pallas"))

    tcfg = TrainConfig(epochs=1, batch_size=2, rank=2, alpha=4, seed=0,
                       quantize_image=True, image_attn_impl="pallas")
    step, _ = make_train_step(TINY_TEST, tcfg, make_optimizer(tcfg, 1))
    trainer_view = step.image_features(qparams, px)
    np.testing.assert_array_equal(
        np.asarray(serving, np.float32), np.asarray(trainer_view, np.float32))
    # and it differs from the fp32 path (i.e. quantization is actually on)
    fp32 = normalize_features(encode_image(params, px, TINY_TEST))
    assert np.abs(np.asarray(serving, np.float32) - np.asarray(fp32)).max() > 0


def test_quantize_image_under_mesh_trains(synth_dataset, tmp_path):
    """Round-2 limitation lifted: quantize_image now works under a mesh —
    the frozen tower's int8 kernels run inside a shard_map over ('data',)
    with replicated visual weights (make_train_step(mesh=...))."""
    from aiic_tpu.parallel import create_mesh

    json_path, root = synth_dataset
    out = train_lora(
        json_path, str(tmp_path / "x.pth"), config=TINY_TEST,
        cfg=TrainConfig(epochs=1, batch_size=8, rank=2, alpha=4,
                        quantize_image=True, image_attn_impl="pallas",
                        cache_image_features=False),  # per-step int8 tower
        image_root=root, mesh=create_mesh(8, tp=2), log=lambda *_: None,
    )
    assert np.isfinite(out["best_val_loss"])
    assert np.abs(np.asarray(out["lora_tree"]["c_fc"]["B"])).max() > 0


def test_pallas_vjp_train_step_matches_xla_on_cpu():
    """The TPU-default training text path (attn_impl='pallas_vjp' — Pallas
    forward in interpret mode on CPU, XLA-derived backward — under remat
    under the LoRA scan) runs end-to-end through make_train_step and
    produces the same loss and adapter updates as the plain XLA path."""
    from aiic_tpu.adapters import LoRAConfig, init_text_lora
    from aiic_tpu.models.init import init_clip_params
    from aiic_tpu.train.trainer import make_train_step

    rng = np.random.default_rng(0)
    batch = 4
    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    pixels = jnp.asarray(
        rng.standard_normal((batch, TINY_TEST.image_size, TINY_TEST.image_size, 3))
        .astype(np.float32))
    tokens = rng.integers(1, TINY_TEST.vocab_size - 2, (batch, TINY_TEST.context_length))
    tokens[:, 0] = TINY_TEST.vocab_size - 2
    tokens[:, -1] = TINY_TEST.vocab_size - 1
    tokens = jnp.asarray(tokens.astype(np.int32))

    results = {}
    for impl in ("xla", "pallas_vjp"):
        cfg = TrainConfig(epochs=1, batch_size=batch, rank=2, alpha=4,
                          attn_impl=impl, image_attn_impl="xla")
        lora = init_text_lora(jax.random.PRNGKey(1), TINY_TEST,
                              LoRAConfig(2, 4, cfg.attach))
        opt = make_optimizer(cfg, steps_per_epoch=2)
        opt_state = opt.init(lora)
        train_step, _ = make_train_step(TINY_TEST, cfg, opt)
        loss, new_lora, _ = train_step(params, lora, opt_state, pixels, tokens,
                                       jax.random.PRNGKey(2))
        results[impl] = (float(loss), new_lora)

    assert np.isfinite(results["pallas_vjp"][0])
    np.testing.assert_allclose(results["pallas_vjp"][0], results["xla"][0],
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(results["xla"][1]),
                    jax.tree.leaves(results["pallas_vjp"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_feature_cache_matches_per_step_recompute(synth_dataset, tmp_path):
    """cache_image_features=True (the default) must reproduce the uncached
    loss trajectory exactly: the frozen tower + deterministic preprocessing
    make per-image features batch-composition-independent, and batch_tokens
    replays batch()'s rng draws, so the two runs see identical (features,
    prompts) streams."""
    json_path, root = synth_dataset
    common = dict(epochs=2, batch_size=8, rank=2, alpha=4, seed=0)
    cached = train_lora(
        json_path, str(tmp_path / "c.pth"), config=TINY_TEST,
        cfg=TrainConfig(cache_image_features=True, **common),
        image_root=root, log=lambda *_: None,
    )
    recomputed = train_lora(
        json_path, str(tmp_path / "r.pth"), config=TINY_TEST,
        cfg=TrainConfig(cache_image_features=False, **common),
        image_root=root, log=lambda *_: None,
    )
    for hc, hr in zip(cached["history"], recomputed["history"]):
        np.testing.assert_allclose(hc["train_loss"], hr["train_loss"],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(hc["val_loss"], hr["val_loss"],
                                   rtol=0, atol=1e-6)
    for kc, kr in zip(jax.tree.leaves(cached["lora_tree"]),
                      jax.tree.leaves(recomputed["lora_tree"])):
        np.testing.assert_allclose(np.asarray(kc), np.asarray(kr), atol=1e-6)


def test_feature_cache_under_mesh(synth_dataset, tmp_path):
    """The cached table is precomputed through the shard_map'd image branch
    (sharded params, ('data',)-placed pixels) and the text-only step runs
    sharded; loss matches the single-device cached run."""
    from aiic_tpu.parallel import create_mesh

    json_path, root = synth_dataset
    common = dict(epochs=1, batch_size=8, rank=2, alpha=4, seed=0)
    single = train_lora(
        json_path, str(tmp_path / "s.pth"), config=TINY_TEST,
        cfg=TrainConfig(**common), image_root=root, log=lambda *_: None,
    )
    meshed = train_lora(
        json_path, str(tmp_path / "m.pth"), config=TINY_TEST,
        cfg=TrainConfig(**common), image_root=root,
        mesh=create_mesh(8, tp=2), log=lambda *_: None,
    )
    np.testing.assert_allclose(
        meshed["history"][0]["train_loss"], single["history"][0]["train_loss"],
        rtol=0, atol=2e-5)


def test_prompt_dedup_matches_dense(synth_dataset, tmp_path):
    """dedup_prompts=True (the default) must reproduce the dense trajectory:
    the text tower is row-independent, so encoding the 8-prompt pool once and
    gathering by index yields the same txt rows as encoding every duplicate;
    gradients agree by linearity (summation order may differ -> small atol)."""
    json_path, root = synth_dataset
    common = dict(epochs=2, batch_size=8, rank=2, alpha=4, seed=0)
    dedup = train_lora(
        json_path, str(tmp_path / "d.pth"), config=TINY_TEST,
        cfg=TrainConfig(dedup_prompts=True, **common),
        image_root=root, log=lambda *_: None,
    )
    dense = train_lora(
        json_path, str(tmp_path / "n.pth"), config=TINY_TEST,
        cfg=TrainConfig(dedup_prompts=False, **common),
        image_root=root, log=lambda *_: None,
    )
    for hd, hn in zip(dedup["history"], dense["history"]):
        np.testing.assert_allclose(hd["train_loss"], hn["train_loss"], atol=2e-5)
        np.testing.assert_allclose(hd["val_loss"], hn["val_loss"], atol=2e-5)
    for kd, kn in zip(jax.tree.leaves(dedup["lora_tree"]),
                      jax.tree.leaves(dense["lora_tree"])):
        np.testing.assert_allclose(np.asarray(kd), np.asarray(kn), atol=1e-4)


def test_prompt_dedup_gated_off_by_dropout(synth_dataset, tmp_path):
    """lora_dropout > 0 silently disables dedup (per-row dropout semantics);
    make_train_step itself refuses an explicit pool + dropout combination."""
    from aiic_tpu.train import make_train_step
    from aiic_tpu.train.trainer import make_optimizer

    json_path, root = synth_dataset
    out = train_lora(
        json_path, str(tmp_path / "dr.pth"), config=TINY_TEST,
        cfg=TrainConfig(epochs=1, batch_size=8, rank=2, alpha=4, seed=0,
                        lora_dropout=0.25),
        image_root=root, log=lambda *_: None,
    )
    assert np.isfinite(out["best_val_loss"])

    cfg = TrainConfig(lora_dropout=0.25)
    opt = make_optimizer(cfg, steps_per_epoch=1)
    with pytest.raises(ValueError, match="dropout"):
        make_train_step(TINY_TEST, cfg, opt,
                        prompt_pool=np.zeros((4, 77), np.int32))


def test_precompute_dedupes_image_paths(synth_dataset):
    """Datasets that repeat an image file must run the tower once per unique
    PATH and share the feature row (precompute_image_features.row_uid map)."""
    from aiic_tpu.data.dataset import load_training_data
    from aiic_tpu.models.init import init_clip_params
    from aiic_tpu.train import make_train_step, precompute_image_features
    from aiic_tpu.train.trainer import PromptedImageDataset, make_optimizer

    json_path, root = synth_dataset
    data = load_training_data(json_path)
    rows = [data[i % 4] for i in range(12)]  # 12 rows over 4 unique files
    ds = PromptedImageDataset(rows, TINY_TEST, image_root=root)

    cfg = TrainConfig(batch_size=4, rank=2, alpha=4)
    opt = make_optimizer(cfg, steps_per_epoch=1)
    step, _ = make_train_step(TINY_TEST, cfg, opt)
    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)

    table = precompute_image_features(step.image_features, params, ds, 4)
    assert table.shape[0] == 12
    assert precompute_image_features.unique_images == 4
    for i in range(12):
        np.testing.assert_array_equal(table[i], table[i % 4])
    # and the shared rows really are the tower's output for that image
    direct = np.asarray(step.image_features(
        params, jnp.asarray(np.stack([ds.load_pixels(i) for i in range(4)]))))
    np.testing.assert_allclose(table[:4], direct, atol=1e-6)

    # pad > unique count (4 uniques at batch 16) must cycle, keeping every
    # device dispatch at the full batch shape
    table16 = precompute_image_features(step.image_features, params, ds, 16)
    np.testing.assert_allclose(table16, table, atol=1e-6)


def test_quantize_text_requires_int8_block_kernel():
    """quantize_text with an attn_impl that cannot select the int8 block
    kernel must fail loudly instead of silently training bf16 adapters."""
    from aiic_tpu.train import make_train_step
    from aiic_tpu.train.trainer import make_optimizer

    cfg = TrainConfig(quantize_text=True, attn_impl="xla")
    opt = make_optimizer(cfg, steps_per_epoch=1)
    with pytest.raises(ValueError, match="quantize_text"):
        make_train_step(TINY_TEST, cfg, opt)


def test_train_trajectory_matches_torch_reference_loop():
    """Multi-step trainer-trajectory parity vs a torch mirror of the
    reference loop (train_lora.py:167-303 semantics: frozen image tower,
    LoRA-wrapped text linears, symmetric CE at logit_scale.exp(), AdamW
    lr=1e-4/wd=0.01 over the adapters, global-norm clip 1.0, cosine
    annealing stepped per epoch).

    The per-op parity tests pin each ingredient; this pins their
    *composition over time* — gradients, clip, AdamW bias correction and
    the schedule all interacting across epochs. Same initial weights
    (converter), same adapters, same batches on both sides; 2 epochs x 2
    steps; asserts the per-step loss curve and the final adapter tree.
    """
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from aiic_tpu.models.config import CLIPConfig, TowerConfig
    from aiic_tpu.models.init import from_hf_clip_state_dict
    from aiic_tpu.train import make_train_step

    cfg_m = CLIPConfig(
        name="traj-test",
        image_size=64,
        patch_size=16,
        vision=TowerConfig(width=128, layers=4, heads=4),
        text=TowerConfig(width=128, layers=4, heads=4),
        vocab_size=1024,
        context_length=16,
        embed_dim=128,
    )
    hf_cfg = transformers.CLIPConfig(
        text_config={
            "hidden_size": 128, "intermediate_size": 512,
            "num_hidden_layers": 4, "num_attention_heads": 4,
            "max_position_embeddings": 16, "vocab_size": 1024,
            "hidden_act": "quick_gelu", "eos_token_id": 1023,
        },
        vision_config={
            "hidden_size": 128, "intermediate_size": 512,
            "num_hidden_layers": 4, "num_attention_heads": 4,
            "image_size": 64, "patch_size": 16, "hidden_act": "quick_gelu",
        },
        projection_dim=128,
    )
    torch.manual_seed(7)
    model = transformers.CLIPModel(hf_cfg).eval()
    params = from_hf_clip_state_dict(model.state_dict(), cfg_m)

    # --- identical data on both sides: 2 fixed batches, reused per epoch ---
    rng = np.random.default_rng(3)
    B, n_steps_per_epoch, n_epochs = 4, 2, 2
    batches = []
    for _ in range(n_steps_per_epoch):
        px = rng.standard_normal((B, 64, 64, 3)).astype(np.float32)
        tk = rng.integers(1, 1000, size=(B, 16), dtype=np.int64)
        for r in range(B):
            p = int(rng.integers(4, 15))
            tk[r, p] = 1023  # EOT = highest id (argmax pooling on our side,
            tk[r, p + 1:] = 0  # eos_token_id position on the HF side)
        batches.append((px, tk))

    # --- identical adapters: A ~ N(0, 0.02^2), B = 0, rank 4 / alpha 8 ---
    rank, alpha, scaling = 4, 8, 2.0
    attach = ("out_proj", "c_fc", "c_proj")
    dims = {"out_proj": (128, 128), "c_fc": (128, 512), "c_proj": (512, 128)}
    a_np = {
        pt: (rng.standard_normal((4, dims[pt][0], rank)) * 0.02).astype(np.float32)
        for pt in attach
    }

    lr, wd, clip = 1e-4, 0.01, 1.0

    # --- torch mirror of the reference loop ---
    class _LoRALinear(torch.nn.Module):
        def __init__(self, base, a, d_out, scaling):
            super().__init__()
            self.base = base
            self.lora_A = torch.nn.Parameter(torch.from_numpy(a).clone())
            self.lora_B = torch.nn.Parameter(
                torch.zeros(a.shape[1], d_out, dtype=torch.float32))
            self.scaling = scaling

        def forward(self, x):
            return self.base(x) + (x @ self.lora_A @ self.lora_B) * self.scaling

    lora_params = []
    for i, layer in enumerate(model.text_model.encoder.layers):
        for pt, getter, setter in (
            ("out_proj", lambda l: l.self_attn.out_proj,
             lambda l, m: setattr(l.self_attn, "out_proj", m)),
            ("c_fc", lambda l: l.mlp.fc1, lambda l, m: setattr(l.mlp, "fc1", m)),
            ("c_proj", lambda l: l.mlp.fc2, lambda l, m: setattr(l.mlp, "fc2", m)),
        ):
            mod = _LoRALinear(getter(layer), a_np[pt][i], dims[pt][1], scaling)
            setter(layer, mod)
            lora_params += [mod.lora_A, mod.lora_B]

    opt = torch.optim.AdamW(lora_params, lr=lr, weight_decay=wd)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=n_epochs)
    ref_losses = []
    for _epoch in range(n_epochs):
        for px, tk in batches:
            with torch.no_grad():
                img = model.get_image_features(
                    pixel_values=torch.from_numpy(px).permute(0, 3, 1, 2))
                img = img / img.norm(dim=-1, keepdim=True)
            txt = model.get_text_features(input_ids=torch.from_numpy(tk))
            txt = txt / txt.norm(dim=-1, keepdim=True)
            logits = model.logit_scale.exp() * img @ txt.t()
            labels = torch.arange(B)
            crit = torch.nn.CrossEntropyLoss()
            loss = (crit(logits, labels) + crit(logits.t(), labels)) / 2
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(lora_params, clip)
            opt.step()
            ref_losses.append(float(loss.detach()))
        sched.step()

    ref_tree = {pt: {"A": [], "B": []} for pt in attach}
    hf_attr = {"out_proj": lambda l: l.self_attn.out_proj,
               "c_fc": lambda l: l.mlp.fc1, "c_proj": lambda l: l.mlp.fc2}
    for layer in model.text_model.encoder.layers:
        for pt in attach:
            mod = hf_attr[pt](layer)
            ref_tree[pt]["A"].append(mod.lora_A.detach().numpy())
            ref_tree[pt]["B"].append(mod.lora_B.detach().numpy())

    # --- our trainer: same step math through make_train_step ---
    tcfg = TrainConfig(
        epochs=n_epochs, batch_size=B, lr=lr, weight_decay=wd,
        grad_clip=clip, rank=rank, alpha=alpha, attach=attach,
        attn_impl="xla", dtype=jnp.float32,
    )
    optimizer = make_optimizer(tcfg, steps_per_epoch=n_steps_per_epoch)
    train_step, _ = make_train_step(cfg_m, tcfg, optimizer)
    train_step = jax.jit(train_step)

    lora_tree = {
        pt: {"A": jnp.asarray(a_np[pt]),
             "B": jnp.zeros((4, rank, dims[pt][1]), jnp.float32)}
        for pt in attach
    }
    opt_state = optimizer.init(lora_tree)
    our_losses = []
    key = jax.random.PRNGKey(0)
    for _epoch in range(n_epochs):
        for px, tk in batches:
            loss, lora_tree, opt_state = train_step(
                params, lora_tree, opt_state,
                jnp.asarray(px), jnp.asarray(tk.astype(np.int32)), key)
            our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=3e-4, atol=3e-4)
    for pt in attach:
        for name in ("A", "B"):
            ours = np.asarray(lora_tree[pt][name])
            ref = np.stack(ref_tree[pt][name])
            np.testing.assert_allclose(ours, ref, atol=5e-6,
                                       err_msg=f"{pt}.{name} diverged")
