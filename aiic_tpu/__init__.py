"""aiic_tpu — TPU-native (JAX/XLA/Pallas/pjit) interior-image classification framework.

A from-scratch rebuild of the capabilities of M1A5TO/AI-interior-image-classifier
(reference mounted at /root/reference), designed TPU-first:

- ``models``   — pure-functional CLIP dual encoder (ViT image tower + causal text
                 tower) as pytrees + jit-able functions, blocks stacked for
                 ``lax.scan`` (reference backbone: external ``clip`` package,
                 loaded at main.py:152).
- ``ops``      — compute ops: attention (XLA + Pallas flash kernel), fused LoRA
                 matmul, device-side PIL-exact bicubic resize as matmuls.
- ``adapters`` — LoRA parameter trees, fold/unfold, and a bit-faithful
                 ``.pth`` <-> JAX converter for the reference checkpoints
                 (reference: main.py:19-113, train_lora.py:15-115).
- ``data``     — CLIP BPE tokenizer, preprocessing, dataset/vocabulary loaders
                 (reference: main.py:264-311, train_lora.py:121-161).
- ``engine``   — batched zero-shot interior detector + attribute analyzer
                 (reference: main.py:149-510).
- ``train``    — LoRA-only contrastive fine-tuning (reference: train_lora.py:167-303).
- ``parallel`` — mesh construction and sharding rules (data/model axes).
- ``serve``    — dynamic-batching worker + REST API + Mongo-semantics queue
                 (reference: python-worker/main_API.py, api-server/app.js).
"""

__version__ = "0.1.0"
