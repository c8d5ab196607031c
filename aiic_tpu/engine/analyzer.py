"""InteriorAnalyzer — the batched inference engine.

Capability-parity rebuild of the reference's ``InteriorImageDetector`` +
``CachedInteriorAnalyzer`` pair (main.py:149-510), with the reference's
architectural bugs fixed rather than copied:

- the reference loads TWO full CLIP models (main.py:238-241); here there is
  one parameter tree shared by detector and analyzer (sound because the
  effective model is identical — SURVEY.md §2c item 3);
- the reference gates interiors at batch 1 per image inside download threads
  (main.py:201-220) and round-trips features through host memory
  (main.py:446-448); here detection + attribute analysis run as ONE jitted
  program per batch bucket (see engine/programs.py);
- LoRA is folded into the backbone at load time instead of wrapping every
  Linear at runtime (main.py:62-74) — mathematically identical for frozen
  adapters, zero runtime overhead.

Output schema matches the reference exactly (main.py:383-391, 461-467),
including the Polish reason strings.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aiic_tpu.adapters import LoRAConfig, fold_text_lora, lora_tree_from_pth
from aiic_tpu.data.dataset import (
    build_category_prompts,
    extract_all_categories,
    load_training_data,
)
from aiic_tpu.data.images import load_image
from aiic_tpu.data.preprocess import preprocess_pil
from aiic_tpu.data.tokenizer import tokenize_for_model
from aiic_tpu.engine.detector import (
    DEFAULT_CONFIDENCE_THRESHOLD,
    DETECTOR_CATEGORIES,
    INTERIOR_COUNT,
)
from aiic_tpu.engine.programs import encode_texts_program, make_classify_fn
from aiic_tpu.models.config import CLIPConfig, VIT_B_16
from aiic_tpu.models.init import init_clip_params
from aiic_tpu.utils.batching import bucket_size, pad_batch


class InteriorAnalyzer:
    """Detector + multi-label attribute analyzer over one CLIP backbone."""

    def __init__(
        self,
        params: Optional[Dict[str, Any]] = None,
        config: CLIPConfig = VIT_B_16,
        *,
        dataset_json: str = "interior_dataset.json",
        training_data: Optional[List[Dict[str, Any]]] = None,
        use_lora: bool = False,
        lora_weights_path: Optional[str] = None,
        lora_rank: int = 4,
        lora_alpha: int = 8,
        dtype: jnp.dtype = jnp.float32,
        attn_impl: str = "auto",
        matmul_precision: Optional[str] = None,
        # 512 measured +2.6% device throughput over 256 (bench.py step 11);
        # only workloads with >=512 images see the bigger bucket — smaller
        # requests still pad to their own power-of-two bucket.
        max_batch: int = 512,
        seed: int = 0,
        text_cache: Optional[str] = None,
        quantize: bool = False,
        mesh=None,
        metrics=None,
        wire_format: str = "hwc",
    ):
        """``mesh``: a ``jax.sharding.Mesh`` for multi-chip serving. Every
        mesh axis is treated as data parallelism: the classify program runs
        under ``jax.shard_map`` so each device executes the exact single-chip
        program — bf16 + Pallas + int8 kernels included — on its local batch
        shard with replicated weights (classification is per-image, so pure
        DP is communication-optimal; see parallel.make_sharded_classify_fn).
        Batch buckets are rounded up to a multiple of the device count."""
        self.config = config
        self.dtype = dtype
        self.max_batch = max_batch
        self.mesh = mesh
        # "hwc": uint8 (B,S,S,3) on the wire, normalize fused on device.
        # "patch": patch-major uint8 (B,N,3*p*p) — normalization folds into
        # the embed matmul (no normalize pass / patchify transposes on
        # device; +2.3% full-program throughput at B=1024, PERF_NOTES), at
        # ~150 us/img of host repack (ops.preprocess.to_patch_major).
        if wire_format not in ("hwc", "patch"):
            raise ValueError(f"wire_format must be 'hwc' or 'patch', got {wire_format!r}")
        self.wire_format = wire_format
        self._bucket_multiple = int(mesh.devices.size) if mesh is not None else 1
        if metrics is None:
            from aiic_tpu.serve.metrics import GLOBAL_METRICS

            metrics = GLOBAL_METRICS
        # Per-stage timings (decode / dispatch / fetch) land on
        # metrics.stages and surface on GET /metrics (SURVEY §5a).
        self.metrics = metrics

        if params is None:
            params = init_clip_params(jax.random.PRNGKey(seed), config)
        else:
            # Real backbone weights + the hermetic fallback vocabulary is a
            # silent-wrong-answers configuration: every text feature would be
            # built from byte-level tokens the real embedding table never saw.
            # Be loud about it (VERDICT r1: misconfiguration must be
            # impossible to miss).
            from aiic_tpu.data.tokenizer import _default_tokenizer

            if _default_tokenizer().hermetic:
                import warnings

                warnings.warn(
                    "InteriorAnalyzer: real backbone weights are loaded but "
                    "the tokenizer is running the HERMETIC fallback "
                    "vocabulary (no bpe_simple_vocab_16e6.txt.gz found). "
                    "Text features will NOT match OpenAI CLIP. Set "
                    "AIIC_BPE_PATH to the real merges file.",
                    stacklevel=2,
                )

        # LoRA: fold into the backbone before any text-feature precompute —
        # same ordering the reference enforces (main.py:243-254 applies LoRA
        # before _precompute_text_features_optimized at main.py:262).
        self.use_lora = False
        if use_lora:
            lc = LoRAConfig(rank=lora_rank, alpha=lora_alpha, attach=("c_fc", "c_proj"))
            # ``lora_weights_path`` accepts a filesystem path OR a pre-loaded
            # checkpoint dict (the worker CLI loads the .pth once and hands
            # the dict to every consumer); only str paths get an exists()
            # probe — os.path.exists raises TypeError on a dict.
            have_ckpt = lora_weights_path is not None and (
                not isinstance(lora_weights_path, str)
                or os.path.exists(lora_weights_path)
            )
            if have_ckpt:
                tree, _meta = lora_tree_from_pth(lora_weights_path, config, lc, seed=seed)
            else:
                from aiic_tpu.adapters import init_text_lora

                tree = init_text_lora(jax.random.PRNGKey(seed), config, lc)
            params = fold_text_lora(params, tree, lc.scaling)
            self.use_lora = True

        # int8 MLP + attention-projection weights (after LoRA folding so
        # adapters are quantized too); active only on the bf16 compute path
        # (models.clip.block).
        self.quantized = False
        if quantize and dtype != jnp.bfloat16:
            import warnings

            warnings.warn(
                "quantize=True ignored on the %s path — the int8 kernels "
                "engage only under dtype=bfloat16 (models.clip.block); "
                "serving stays un-quantized" % jnp.dtype(dtype).name,
                stacklevel=2,
            )
        elif quantize:
            from aiic_tpu.ops.quant import quantize_model

            params = quantize_model(params)
            self.quantized = True
        self.params = params

        # Attribute vocabulary from the dataset (main.py:259-262).
        if training_data is None:
            training_data = load_training_data(dataset_json) if os.path.exists(dataset_json) else []
        self.training_data = training_data
        self.all_categories = extract_all_categories(training_data)
        self.category_names = [k for k, v in self.all_categories.items() if v]

        # Precompute text features: one jitted text-encoder call over the
        # concatenation of detector + category prompts. A persisted cache
        # (``text_cache``) skips this — the encode dominates engine cold
        # start (~60 s on a 1-core host).
        if text_cache and os.path.exists(text_cache):
            blob = np.load(text_cache, allow_pickle=False)
            self.det_text = jnp.asarray(blob["det_text"])
            self.cat_text = jnp.asarray(blob["cat_text"])
            self.cat_mask = jnp.asarray(blob["cat_mask"])
        else:
            prompts_by_cat = build_category_prompts(self.all_categories)
            all_prompts = list(DETECTOR_CATEGORIES)
            spans = {}
            for name in self.category_names:
                start = len(all_prompts)
                all_prompts.extend(prompts_by_cat[name])
                spans[name] = (start, len(all_prompts))

            encode_texts = jax.jit(
                lambda p, t: encode_texts_program(
                    p, t, config=config, dtype=dtype, attn_impl=attn_impl
                )
            )
            feats = np.asarray(
                encode_texts(params, jnp.asarray(tokenize_for_model(all_prompts, config)))
            )
            self.det_text = jnp.asarray(feats[: len(DETECTOR_CATEGORIES)])

            n_cat = len(self.category_names)
            max_n = max((spans[n][1] - spans[n][0] for n in self.category_names), default=1)
            cat_text = np.zeros((max(n_cat, 1), max_n, config.embed_dim), np.float32)
            cat_mask = np.zeros((max(n_cat, 1), max_n), bool)
            for ci, name in enumerate(self.category_names):
                s, e = spans[name]
                cat_text[ci, : e - s] = feats[s:e]
                cat_mask[ci, : e - s] = True
            self.cat_text = jnp.asarray(cat_text)
            self.cat_mask = jnp.asarray(cat_mask)
            if text_cache:
                np.savez(
                    text_cache,
                    det_text=np.asarray(self.det_text),
                    cat_text=np.asarray(self.cat_text),
                    cat_mask=np.asarray(self.cat_mask),
                )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from aiic_tpu.parallel.sharding import make_sharded_classify_fn

            # Replicate weights once at load time; shard_map keeps the
            # single-chip serving program (Pallas/int8 kernels) per device.
            repl = NamedSharding(mesh, PartitionSpec())
            self.params = jax.device_put(self.params, repl)
            raw = make_classify_fn(
                config, INTERIOR_COUNT, dtype=dtype, attn_impl=attn_impl,
                matmul_precision=matmul_precision, jit=False,
            )
            self._classify = make_sharded_classify_fn(
                mesh, raw, self.params, kernels=True
            )
        else:
            self._classify = make_classify_fn(
                config,
                INTERIOR_COUNT,
                dtype=dtype,
                attn_impl=attn_impl,
                matmul_precision=matmul_precision,
            )
        self._attn_impl = attn_impl
        self._matmul_precision = matmul_precision
        # Per-geometry fused resize+classify programs (device_resize path).
        self._resize_programs: Dict[tuple, Any] = {}

    # ------------------------------------------------------------------
    # Device passes
    # ------------------------------------------------------------------

    def _preprocess_host(self, img) -> np.ndarray:
        """PIL image -> host pixels in the engine's wire format: normalized
        float32 HWC (the reference-exact parity form), or the uint8
        resize+crop when ``wire_format='patch'`` (normalization folds into
        the device program; _dispatch_chunk repacks to patch-major)."""
        if self.wire_format == "patch":
            from aiic_tpu.data.preprocess import preprocess_pil_u8

            return preprocess_pil_u8(img, self.config.image_size)
        return preprocess_pil(img, self.config.image_size)

    def warmup(self, batch_sizes: Optional[Sequence[int]] = None) -> None:
        """Precompile the classify program for the given batch buckets
        (default: every power-of-two up to max_batch). Serving should call
        this before accepting traffic — a cold bucket costs seconds of XLA
        compile on first hit."""
        if batch_sizes is None:
            batch_sizes = []
            b = 1
            while b <= self.max_batch:
                batch_sizes.append(b)
                b <<= 1
        s = self.config.image_size
        seen = set()
        for b in batch_sizes:
            # dedupe on the FINAL bucket a live request of size b would
            # compile (same bucket_size-then-round order as _dispatch_chunk;
            # rounding first would precompile buckets nothing ever hits)
            cap = max(self.max_batch, b)
            fb = self._final_bucket(b, cap)
            if fb in seen:
                continue
            seen.add(fb)
            # pass the same cap the dedupe key used: without it a warm size
            # b > max_batch would chunk into max_batch-row dispatches and the
            # claimed fb bucket would never actually compile
            self.classify_pixels(np.zeros((b, s, s, 3), np.uint8), max_batch=cap)

    def classify_pixels(
        self, pixels: np.ndarray, max_batch: Optional[int] = None
    ) -> Dict[str, np.ndarray]:
        """Run the fused program over (N, S, S, 3) preprocessed pixels,
        chunked into padded power-of-two buckets to bound recompilation.

        All chunks are dispatched before any result is fetched, so
        host->device transfer of chunk i+1 overlaps compute of chunk i
        (device fetches are the only sync points on this backend).

        ``max_batch`` overrides the engine's bucket ceiling for THIS call
        only (it never mutates ``self.max_batch`` — a small request must not
        lower the ceiling for later callers)."""
        cap = max_batch or self.max_batch
        n = pixels.shape[0]
        pending: List[tuple] = []
        i = 0
        while i < n:
            chunk = pixels[i : i + cap]
            pending.append(self._dispatch_chunk(chunk, cap))
            i += len(chunk)
        return self._fetch_pending(pending)

    def dispatch_pixels(
        self, pixels: np.ndarray, max_batch: Optional[int] = None
    ) -> List[tuple]:
        """Dispatch-only half of classify_pixels: enqueue the device
        program(s) for ``pixels`` and return a pending handle WITHOUT
        fetching results. Pair with ``fetch_results`` — the serving batcher
        uses this split to overlap batch i's result fetch (a ~30 ms relay
        round trip in this container) with batch i+1's dispatch."""
        cap = max_batch or self.max_batch
        pending: List[tuple] = []
        i = 0
        while i < pixels.shape[0]:
            chunk = pixels[i : i + cap]
            pending.append(self._dispatch_chunk(chunk, cap))
            i += len(chunk)
        return pending

    def fetch_results(self, pending: List[tuple]) -> Dict[str, np.ndarray]:
        """Blocking half of the dispatch/fetch pair: resolve a
        ``dispatch_pixels`` handle into the classify result dict."""
        return self._fetch_pending(pending)

    def _final_bucket(self, n: int, cap: int) -> int:
        """Bucket a request of n rows actually compiles: power-of-two bucket
        rounded up to the mesh device-count multiple."""
        b = bucket_size(n, cap)
        m = self._bucket_multiple
        if b % m:  # mesh mode: shard_map needs batch % device_count == 0
            b = ((b + m - 1) // m) * m
        return b

    def _dispatch_chunk(self, chunk: np.ndarray, cap: int) -> tuple:
        """Pad one chunk to its bucket and dispatch the device program
        WITHOUT fetching — callers queue several dispatches so host work
        (decode of the next batch) and device compute overlap."""
        if self.wire_format == "patch" and chunk.ndim == 4 and chunk.dtype == np.uint8:
            from aiic_tpu.ops.preprocess import to_patch_major

            chunk = to_patch_major(chunk, self.config.patch_size)
        padded, valid = pad_batch(chunk, self._final_bucket(len(chunk), cap))
        with self.metrics.stages.stage("dispatch"):
            res = self._classify(
                self.params, jnp.asarray(padded), self.det_text, self.cat_text, self.cat_mask
            )
        return res, valid

    def _resize_classify_for(self, geometry: tuple):
        """jitted program for RAW uint8 (B, H, W, 3) of one fixed geometry:
        device-side bicubic resize (two MXU matmuls) + center crop +
        normalize fused into the same XLA program as the encoder
        (ops/preprocess.device_preprocess_fixed — BASELINE config #3's
        'fused decode->resize->normalize->patch-embed' without the host
        resize). One compile per (geometry, bucket)."""
        prog = self._resize_programs.get(geometry)
        if prog is None:
            from aiic_tpu.ops.preprocess import make_resize_mats

            h, w = geometry
            ky, kx, top, left = make_resize_mats(h, w, self.config.image_size)
            base = make_classify_fn(
                self.config, INTERIOR_COUNT, dtype=self.dtype,
                attn_impl=self._attn_impl,
                matmul_precision=self._matmul_precision, jit=False,
            )
            size = self.config.image_size
            dtype = self.dtype

            def fn(params, raw_u8, ky, kx, det_text, cat_text, cat_mask):
                from aiic_tpu.ops.preprocess import device_preprocess_fixed

                px = device_preprocess_fixed(raw_u8, ky, kx, top, left, size,
                                             dtype=dtype)
                return base(params, px, det_text, cat_text, cat_mask)

            prog = (jax.jit(fn), jnp.asarray(ky), jnp.asarray(kx))
            self._resize_programs[geometry] = prog
        return prog

    def _analyze_device_resize(self, image_paths, batch_size, record_load_error):
        """Decode-only on the host, resize on the device, grouped by source
        geometry. Returns (merged results or None, good_paths in result-row
        order). Best when geometries repeat (each distinct geometry compiles
        its own program); arbitrary-geometry corpora should use the default
        host-resize path."""
        from aiic_tpu.data.native_loader import decode_jpeg_raw

        cap = batch_size or self.max_batch
        pending: List[tuple] = []
        good_paths: List[str] = []
        groups: Dict[tuple, list] = {}

        def flush(geom):
            # dispatch a full (or final partial) geometry group and DROP the
            # host copies — memory stays bounded by cap rows per active
            # geometry instead of the whole decoded corpus, and device
            # compute overlaps the remaining decode
            items = groups.pop(geom, [])
            if not items:
                return
            fn, ky, kx = self._resize_classify_for(geom)
            raw = np.stack([a for _, a in items])
            padded, valid = pad_batch(raw, bucket_size(len(items), cap))
            with self.metrics.stages.stage("dispatch"):
                res = fn(self.params, jnp.asarray(padded), ky, kx,
                         self.det_text, self.cat_text, self.cat_mask)
            pending.append((res, valid))
            good_paths.extend(p for p, _ in items)

        for p in image_paths:
            with self.metrics.stages.stage("decode"):
                try:
                    with open(p, "rb") as f:
                        blob = f.read()
                except OSError:
                    blob = b""
                arr = decode_jpeg_raw(blob)
            if arr is None:
                record_load_error(p)
                continue
            geom = arr.shape[:2]
            groups.setdefault(geom, []).append((p, arr))
            if len(groups[geom]) >= cap:
                flush(geom)
        for geom in list(groups):
            flush(geom)
        if not pending:
            return None, good_paths
        return self._fetch_pending(pending), good_paths

    def _fetch_pending(self, pending: List[tuple]) -> Dict[str, np.ndarray]:
        """Fetch and merge a list of (result tree, valid count) dispatches.
        Starts all device->host copies before blocking on any: each fetch
        pays a full relay round trip otherwise (~30 ms x 7 outputs)."""
        with self.metrics.stages.stage("fetch"):
            for res, _ in pending:
                for v in res.values():
                    if hasattr(v, "copy_to_host_async"):
                        v.copy_to_host_async()
            outs = [{k: np.asarray(v)[:valid] for k, v in res.items()} for res, valid in pending]
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]} if outs else {}

    def _consume_loader(self, loader, image_paths, cap, good_paths,
                        record_load_error) -> Optional[Dict[str, np.ndarray]]:
        """Drain a prefetching loader (PrefetchingLoader or ByteStreamLoader
        — same (pixels, ok, index-range) batch protocol): record per-path
        load errors, dispatch the kept rows, fetch once at the end. One copy
        of the dispatch/record logic keeps load-error/reason-string parity
        identical across the local-JPEG and byte-stream paths. Returns the
        merged classify results, or None when nothing decoded."""
        pending: List[tuple] = []
        it = iter(loader)
        try:
            while True:
                # decode_stall = time the device pipeline sat idle waiting on
                # the host decoder (0 when decode fully overlaps compute).
                with self.metrics.stages.stage("decode_stall"):
                    item = next(it, None)
                if item is None:
                    break
                pixels_u8, ok, (start, end) = item
                for j in range(start, end):
                    if ok[j - start]:
                        good_paths.append(image_paths[j])
                    else:
                        record_load_error(image_paths[j])
                kept = pixels_u8[ok]
                if len(kept):
                    pending.append(self._dispatch_chunk(kept, cap))
        except Exception:
            # a dispatch failure abandons the stream: release its producer
            # thread + fetch pool instead of leaving them blocked
            if hasattr(it, "close"):
                it.close()
            raise
        if not pending:
            return None
        return self._fetch_pending(pending)

    # ------------------------------------------------------------------
    # Host orchestration (reference-schema results)
    # ------------------------------------------------------------------

    def _assemble_analysis(self, res: Dict[str, np.ndarray], row: int) -> Dict[str, list]:
        analysis = {}
        for ci, name in enumerate(self.category_names):
            attrs = self.all_categories[name]
            k = min(5, len(attrs))
            vals = res["topk_vals"][row, ci, :k]
            idx = res["topk_idx"][row, ci, :k]
            analysis[name] = [(attrs[int(i)], float(v)) for v, i in zip(vals, idx)]
        return analysis

    def analyze_images_batch(
        self,
        image_paths: Sequence[str],
        batch_size: Optional[int] = None,
        filter_interiors: bool = True,
        confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
        max_workers: int = 8,
        device_resize: bool = False,
        fast_decode: bool = False,
    ) -> Dict[str, Dict[str, Any]]:
        """Batch pipeline with the reference's result contract
        (main.py:371-469): every input path maps to a result dict.
        ``batch_size`` caps the device bucket for this call only.
        ``device_resize``: decode-only on the host, bicubic resize on the
        device as matmuls (local JPEGs only, grouped by source geometry —
        see _analyze_device_resize for the trade-offs). Not supported under
        a mesh (the per-geometry resize programs are single-device); a
        mesh-backed analyzer warns and uses the host-resize streaming path.
        ``fast_decode``: DCT-scaled JPEG decode on the streaming path (up to
        64x fewer pixels through IDCT+resize on large sources) — a
        quality-approximate opt-in for decode-bound hosts, NOT bit-exact
        PIL preprocessing; ignored by the device_resize path (which needs
        the full source geometry on device)."""
        if device_resize and self.mesh is not None:
            import warnings

            warnings.warn(
                "device_resize=True is ignored under a mesh (per-geometry "
                "resize programs are single-device); using the host-resize "
                "streaming path", stacklevel=2)
        results: Dict[str, Dict[str, Any]] = {}
        good_paths: List[str] = []

        def record_load_error(path):
            # Reason-string parity per path: under filter_interiors the
            # reference routes load failures through the filter stage, which
            # records them as non-interiors (main.py:330,353-358); with the
            # filter off they surface as load errors (main.py:420-426).
            if filter_interiors:
                reason = "Nie wnętrze: load error (confidence: 0.000)"
            else:
                reason = "Błąd ładowania: could not load image"
            results[path] = {
                "is_interior": False,
                "interior_confidence": 0.0,
                "detected_category": "load error",
                "analysis": {},
                "reason": reason,
            }

        # Fast path: local JPEG files STREAMED through the double-buffered
        # native C++ decode+resize pipeline (data/pipeline.PrefetchingLoader):
        # batch i+1 decodes on the host while batch i computes on the device,
        # instead of decoding the whole job before the first dispatch
        # (round-2 VERDICT weak #3). uint8 on the wire; normalization fused
        # on device.
        local_jpegs = all(
            not p.startswith("http") and p.lower().endswith((".jpg", ".jpeg"))
            for p in image_paths
        ) and len(image_paths) > 0
        if local_jpegs and device_resize and self.mesh is None:
            res, good_paths = self._analyze_device_resize(
                image_paths, batch_size, record_load_error
            )
            if res is None:
                return results
        else:
            cap = batch_size or self.max_batch
            wire_patch = (self.config.patch_size
                          if self.wire_format == "patch" else 0)
            if local_jpegs:
                # Local JPEGs: double-buffered native C++ decode+resize
                # pipeline — batch i+1 decodes on the host while batch i
                # computes on the device. The C++ pool emits the patch-major
                # wire directly, so the wire repack costs nothing here.
                from aiic_tpu.data.pipeline import PrefetchingLoader

                loader = PrefetchingLoader(
                    list(image_paths), batch_size=cap,
                    size=self.config.image_size, fast=fast_decode,
                    patch=wire_patch,
                )
            else:
                # URL / mixed-format / mixed-location inputs: STREAMED byte
                # pipeline (round-3 VERDICT weak #2). ByteStreamLoader
                # three-stage pipelines the reference's production workload
                # (CSV of offer URLs, main.py:516-524): a max_workers-wide
                # fetch pool downloads batch i+1 while the native pool
                # decodes batch i (PIL-exact for JPEG, per-blob Python
                # fallback for PNG/WebP/...; fast_decode = DCT-scaled
                # decode, downloads included) and batch i-1 computes on the
                # device.
                from aiic_tpu.data.pipeline import ByteStreamLoader

                loader = ByteStreamLoader(
                    list(image_paths), batch_size=cap,
                    size=self.config.image_size, fetch_workers=max_workers,
                    fast=fast_decode, patch=wire_patch,
                )
            res = self._consume_loader(
                loader, image_paths, cap, good_paths, record_load_error)
            if res is None:
                return results

        for row, path in enumerate(good_paths):
            conf = float(res["interior_mass"][row])
            top_conf = float(res["top_conf"][row])
            category = DETECTOR_CATEGORIES[int(res["top_idx"][row])]
            is_interior = (
                res["interior_mass"][row] > res["non_interior_mass"][row]
                and top_conf > confidence_threshold
            )
            if filter_interiors and not is_interior:
                results[path] = {
                    "is_interior": False,
                    "interior_confidence": conf,
                    "detected_category": category,
                    "analysis": {},
                    "reason": f"Nie wnętrze: {category} (confidence: {conf:.3f})",
                }
            else:
                results[path] = {
                    "is_interior": True,
                    "interior_confidence": conf if filter_interiors else 1.0,
                    "detected_category": "interior",
                    "analysis": self._assemble_analysis(res, row),
                    "reason": "Success - interior image analyzed",
                }
        return results

    def filter_interior_images(
        self,
        image_paths: Sequence[str],
        confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
        max_workers: int = 8,
    ):
        """Standalone interior filter (reference main.py:313-369 contract):
        returns (interior_images, non_interior_info) where interior_images is
        a list of (path, pixels, confidence) and non_interior_info carries the
        structured rejection records — but gated in ONE batched device pass
        instead of per-image batch-1 calls."""
        from concurrent.futures import ThreadPoolExecutor

        def fetch(p):
            img = load_image(p)
            return p, None if img is None else self._preprocess_host(img)

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            fetched = list(pool.map(fetch, image_paths))

        interior_images, non_interior_info = [], []
        good = [(p, px) for p, px in fetched if px is not None]
        for p, px in fetched:
            if px is None:
                non_interior_info.append({
                    "path": p, "confidence": 0.0, "category": "load error",
                    "reason": "Nie wnętrze: load error (confidence: 0.000)",
                })
        if good:
            res = self.classify_pixels(np.stack([px for _, px in good]))
            for row, (p, px) in enumerate(good):
                conf = float(res["interior_mass"][row])
                category = DETECTOR_CATEGORIES[int(res["top_idx"][row])]
                is_interior = (
                    res["interior_mass"][row] > res["non_interior_mass"][row]
                    and float(res["top_conf"][row]) > confidence_threshold
                )
                if is_interior:
                    interior_images.append((p, px, conf))
                else:
                    non_interior_info.append({
                        "path": p, "confidence": conf, "category": category,
                        "reason": f"Nie wnętrze: {category} (confidence: {conf:.3f})",
                    })
        return interior_images, non_interior_info

    def is_interior_image(self, image, confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD):
        """Single-image detector (reference main.py:191-226 contract):
        returns (is_interior, interior_confidence, top_category)."""
        if image is None:
            return False, 0.0, "invalid image"
        px = self._preprocess_host(image)[None]
        res = self.classify_pixels(px)
        conf = float(res["interior_mass"][0])
        category = DETECTOR_CATEGORIES[int(res["top_idx"][0])]
        is_interior = (
            res["interior_mass"][0] > res["non_interior_mass"][0]
            and float(res["top_conf"][0]) > confidence_threshold
        )
        return bool(is_interior), conf, category

    def analyze_image_from_url(self, url: str, filter_interiors: bool = True) -> Dict[str, Any]:
        """Single-URL convenience wrapper (reference main.py:472-498)."""
        img = load_image(url)
        if img is None:
            return {"is_interior": False, "reason": "Failed to load image"}
        res = self.classify_pixels(self._preprocess_host(img)[None])
        conf = float(res["interior_mass"][0])
        category = DETECTOR_CATEGORIES[int(res["top_idx"][0])]
        is_interior = (
            res["interior_mass"][0] > res["non_interior_mass"][0]
            and float(res["top_conf"][0]) > DEFAULT_CONFIDENCE_THRESHOLD
        )
        if filter_interiors and not is_interior:
            return {
                "is_interior": False,
                "interior_confidence": conf,
                "detected_category": category,
                "analysis": {},
                "reason": f"Not an interior image: {category}",
            }
        return {
            "is_interior": True,
            "interior_confidence": conf if filter_interiors else 1.0,
            "detected_category": "interior",
            "analysis": self._assemble_analysis(res, 0),
            "reason": "Success - interior image analyzed",
        }
