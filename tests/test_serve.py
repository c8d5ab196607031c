"""Serving tests: worker loop vs in-memory DB, dynamic batcher, REST surface."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from aiic_tpu.engine.analyzer import InteriorAnalyzer
from aiic_tpu.models.config import TINY_TEST
from aiic_tpu.serve.batcher import DynamicBatcher
from aiic_tpu.serve.db import InMemoryDB, seed_demo_data
from aiic_tpu.serve.rest import make_server, serve_forever_in_thread
from aiic_tpu.serve.worker import ApartmentWorker, process_apartments_pipeline


TRAINING = [
    {"image_path": "a.jpg", "style": "nowoczesny", "characteristics": ["jasne"],
     "materials": ["drewno"], "colors": ["biały"], "room_type": "kuchnia"},
    {"image_path": "b.jpg", "style": "klasyczny", "characteristics": ["ciemne"],
     "materials": ["marmur"], "colors": ["czarny"], "room_type": "salon"},
]


@pytest.fixture(scope="module")
def analyzer():
    return InteriorAnalyzer(config=TINY_TEST, training_data=TRAINING, max_batch=8)


@pytest.fixture()
def db_with_images(tmp_path):
    from PIL import Image

    db = InMemoryDB()
    db.insert_apartment("apt1", title="test apt")
    rng = np.random.default_rng(0)
    for i in range(3):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(p)
        db.insert_image(f"img{i}", "apt1", str(p))
    db.insert_image("img_bad", "apt1", str(tmp_path / "missing.png"))
    return db


def test_db_queue_semantics():
    db = InMemoryDB()
    seed_demo_data(db)
    pending = db.get_pending_apartments()
    assert {p["_id"] for p in pending} == {"apt1", "apt2"}
    assert pending[0]["pending_count"] == 2

    db.update_image_analysis("img1", "kuchnia", "nowoczesny", 0.8)
    db.update_image_analysis("img2", "not_interior", "unknown", 0.0)
    pending = db.get_pending_apartments()
    assert {p["_id"] for p in pending} == {"apt2"}
    assert db.images["img1"]["analysis_status"] == "completed"
    assert db.images["img2"]["analysis_status"] == "not_interior"


def test_worker_full_pipeline(analyzer, db_with_images, tmp_path):
    export = str(tmp_path / "export.json")
    out = process_apartments_pipeline(
        db=db_with_images, analyzer=analyzer, export_file=export, log=lambda *_: None
    )
    assert out == export

    # Every loadable image left the pending state
    statuses = {i["_id"]: i["analysis_status"] for i in db_with_images.images.values()}
    assert statuses["img_bad"] == "pending"  # unloadable stays pending for retry
    for i in range(3):
        assert statuses[f"img{i}"] in ("completed", "not_interior")

    exported = json.loads(open(export, encoding="utf-8").read())
    if db_with_images.analysis_results:
        rec = exported[0]
        assert set(rec) >= {
            "apartment_id", "overall_style", "room_distribution",
            "analyzed_images", "total_images", "confidence",
        }
        assert rec["total_images"] == 4


def test_dominant_style_and_room_distribution():
    analyses = [
        {"room_type": "kuchnia", "style": "boho", "style_confidence": 0.9, "detection_confidence": 1.0},
        {"room_type": "salon", "style": "boho", "style_confidence": 0.7, "detection_confidence": 1.0},
        {"room_type": "salon", "style": "retro", "style_confidence": 0.99, "detection_confidence": 1.0},
    ]
    dom = ApartmentWorker.calculate_dominant_style(analyses)
    assert dom["style"] == "boho"
    np.testing.assert_allclose(dom["confidence"], 0.8)
    assert ApartmentWorker.calculate_room_distribution(analyses) == {"kuchnia": 1, "salon": 2}
    assert ApartmentWorker.calculate_dominant_style([]) == {"style": "unknown", "confidence": 0.0}


def test_dynamic_batcher_coalesces_and_fans_out():
    seen_batches = []

    def run_batch(items):
        seen_batches.append(items.shape[0])
        return [float(x.sum()) for x in items]

    b = DynamicBatcher(run_batch, max_batch=8, max_wait_ms=50.0)
    items = [np.full((2, 2), i, np.float32) for i in range(6)]
    futs = [b.submit(x) for x in items]
    results = [f.result(timeout=5) for f in futs]
    assert results == [float(x.sum()) for x in items]
    assert max(seen_batches) > 1  # actually coalesced
    b.close()


def test_dynamic_batcher_error_propagates():
    def run_batch(items):
        raise RuntimeError("boom")

    b = DynamicBatcher(run_batch, max_batch=4, max_wait_ms=5.0)
    fut = b.submit(np.zeros((1,)))
    with pytest.raises(RuntimeError):
        fut.result(timeout=5)
    b.close()


def test_dynamic_batcher_pipelined_overlaps_and_matches_sync():
    """Pipelined mode (fetch_batch given): results identical to sync mode,
    and the collector dispatches batch i+1 BEFORE batch i's fetch completes
    (the overlap that hides the per-fetch relay round trip)."""
    order = []

    def dispatch(items):
        order.append("dispatch")
        return [float(x.sum()) for x in items]

    def fetch(handle):
        time.sleep(0.05)  # slow result readback (the ~30 ms relay RTT)
        order.append("fetch_end")
        return handle

    b = DynamicBatcher(dispatch, fetch_batch=fetch, pipeline_depth=2,
                       max_batch=2, max_wait_ms=5.0)
    items = [np.full((2, 2), i, np.float32) for i in range(8)]
    futs = [b.submit(x) for x in items]
    results = [f.result(timeout=10) for f in futs]
    assert results == [float(x.sum()) for x in items]
    b.close()
    # at least one later dispatch landed before an earlier fetch finished
    first_fetch_end = order.index("fetch_end")
    assert order[:first_fetch_end].count("dispatch") >= 2, order


def test_dynamic_batcher_pipelined_coalesces_while_device_busy():
    """Anti-fragmentation rule: while ALL pipeline slots are busy, an
    under-full batch is NOT closed at max_wait (it could not start any
    sooner anyway) — staggered arrivals coalesce into one big batch instead
    of a trickle of fragments (the measured 64-lockstep-client failure
    mode). While a slot IS free, the batch still closes at max_wait — a
    free slot can start it immediately, so holding it would only add
    latency (round-4 ADVICE)."""
    sizes = []

    def dispatch(items):
        sizes.append(items.shape[0])
        return [float(x.sum()) for x in items]

    def fetch(handle):
        time.sleep(0.25)  # long device service time
        return handle

    b = DynamicBatcher(dispatch, fetch_batch=fetch, pipeline_depth=2,
                       max_batch=16, max_wait_ms=10.0)
    items = [np.full((2, 2), i, np.float32) for i in range(9)]
    futs = [b.submit(items[0])]
    time.sleep(0.05)  # first batch (size 1) dispatched and now in flight
    # stagger 8 more submissions across 80 ms — far beyond max_wait
    for x in items[1:]:
        futs.append(b.submit(x))
        time.sleep(0.01)
    results = [f.result(timeout=10) for f in futs]
    assert results == [float(x.sum()) for x in items]
    b.close()
    # without the rule this fragments into ~6+ batches of 1-2 (10 ms
    # waves); with it, one small batch may dispatch into the FREE second
    # slot at max_wait, and everything arriving while both slots are busy
    # coalesces into one big follow-up batch
    assert sizes[0] == 1
    assert len(sizes) <= 4, sizes
    assert max(sizes[1:]) >= 5, sizes


def test_dynamic_batcher_pipelined_fetch_error_propagates():
    def dispatch(items):
        return items

    def fetch(handle):
        raise RuntimeError("fetch boom")

    b = DynamicBatcher(dispatch, fetch_batch=fetch, max_batch=4, max_wait_ms=5.0)
    fut = b.submit(np.zeros((1,)))
    with pytest.raises(RuntimeError, match="fetch boom"):
        fut.result(timeout=5)
    b.close()


def test_serving_app_pipelined_matches_sync(analyzer, ref_root):
    """build_serving_app (the CLI's serving assembly): the pipelined
    dispatch/fetch path returns byte-identical responses to the synchronous
    path, under concurrent clients."""
    from concurrent.futures import ThreadPoolExecutor

    from aiic_tpu.serve.app import build_serving_app

    with open(f"{ref_root}/interior_sample.jpg", "rb") as f:
        payload = f.read()

    def post_all(port, n):
        def one(_):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/analyze", data=payload, method="POST")
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read().decode())
        with ThreadPoolExecutor(max_workers=n) as pool:
            return list(pool.map(one, range(n)))

    outs = {}
    for depth in (2, 0):
        server, batcher, warmed = build_serving_app(
            analyzer, db=InMemoryDB(), port=0, max_batch=8, max_wait_ms=5.0,
            pipeline_depth=depth, warm_buckets=(1, 2), warm_async=False,
            log=lambda *_: None)
        assert warmed.is_set()
        serve_forever_in_thread(server)
        try:
            outs[depth] = post_all(server.server_address[1], 8)
        finally:
            server.shutdown()
            batcher.close()
    for res in outs[2]:
        # full reference result contract (main.py:383-391)
        assert set(res) == {"is_interior", "interior_confidence",
                            "detected_category", "analysis", "reason"}
    # all 8 requests carry the same payload; responses must agree across
    # modes up to bucket-composition float jitter (a request that lands in
    # a 1-row vs 8-row padded bucket sees ~1e-6 matmul-tiling differences)
    ref = outs[0][0]
    for res in outs[2] + outs[0]:
        assert res["is_interior"] == ref["is_interior"]
        np.testing.assert_allclose(res["interior_confidence"],
                                   ref["interior_confidence"], atol=1e-4)
        for cat, top in res["analysis"].items():
            for (name_a, p_a), (name_b, p_b) in zip(top, ref["analysis"][cat]):
                assert name_a == name_b
                np.testing.assert_allclose(p_a, p_b, atol=1e-4)


def test_rest_endpoints(db_with_images):
    server = make_server(db=db_with_images, port=0)  # ephemeral port
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
                return r.status, json.loads(r.read().decode())

        status, root = get("/")
        assert status == 200 and "endpoints" in root
        status, health = get("/health")
        assert status == 200 and health["status"] == "OK"
        _, test = get("/test")
        assert test == {"message": "Hello World! Test successful!"}
        _, pending = get("/process-pending")
        assert pending["pending"][0]["_id"] == "apt1"
        _, apt = get("/process/apt1")
        assert apt["id"] == "apt1" and len(apt["images"]) == 4
        # 404 raises HTTPError via urllib:
        with pytest.raises(urllib.error.HTTPError):
            get("/process/nope")
        _, results = get("/results")
        assert "results" in results
        # POST /analyze without analyzer -> 503
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze", data=b"junk", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=5)
        assert exc.value.code == 503
    finally:
        server.shutdown()


def test_dead_lettering_after_max_attempts():
    db = InMemoryDB()
    db.insert_apartment("a", title="t")
    db.insert_image("bad", "a", "/nope.jpg")
    for _ in range(2):
        db.mark_image_attempt("bad", "load failed", max_attempts=3)
        assert db.images["bad"]["analysis_status"] == "pending"
    db.mark_image_attempt("bad", "load failed", max_attempts=3)
    assert db.images["bad"]["analysis_status"] == "failed"
    assert db.images["bad"]["attempts"] == 3
    assert db.get_pending_apartments() == []


def test_metrics_counters():
    from aiic_tpu.serve.metrics import Metrics

    m = Metrics()
    m.observe_batch(4, 8, 0.5)
    m.observe_batch(8, 8, 0.5)
    snap = m.snapshot()
    assert snap["images_total"] == 12
    assert snap["batches_total"] == 2
    assert snap["last_batch_occupancy"] == 1.0
    assert abs(snap["images_per_sec_avg"] - 12.0) < 1e-6


def test_rest_metrics_endpoint(db_with_images):
    server = make_server(db=db_with_images, port=0)
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=5) as r:
            snap = json.loads(r.read().decode())
        assert "uptime_seconds" in snap
    finally:
        server.shutdown()


def test_batcher_concurrent_stress():
    """Many producers, results must route to the right futures."""
    def run_batch(items):
        return [float(x[0]) for x in items]

    b = DynamicBatcher(run_batch, max_batch=16, max_wait_ms=2.0)
    from concurrent.futures import ThreadPoolExecutor

    def one(i):
        return b(np.array([float(i)]))

    with ThreadPoolExecutor(max_workers=32) as pool:
        results = list(pool.map(one, range(200)))
    assert results == [float(i) for i in range(200)]
    snap = b.metrics.snapshot()
    assert snap["images_total"] >= 200
    b.close()


def test_stage_timer():
    from aiic_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0


def test_rest_analyze_endpoint_with_analyzer(analyzer, ref_root):
    """POST /analyze wired to a real engine (the worker CLI's layout)."""
    import io

    from aiic_tpu.data.images import decode_image_bytes
    from aiic_tpu.data.preprocess import (
        center_crop_bounds,
        resize_bicubic_numpy,
        resize_target,
    )

    batcher = DynamicBatcher(
        lambda pixels: [
            {"is_interior": bool(r > 0.5), "interior_confidence": float(r)}
            for r in analyzer.classify_pixels(pixels)["interior_mass"]
        ],
        max_batch=8, max_wait_ms=5.0,
    )
    size = analyzer.config.image_size

    def analyze_bytes(data):
        arr = decode_image_bytes(data)
        if arr is None:
            return {"error": "could not decode image"}
        h, w = arr.shape[:2]
        nw, nh = resize_target(w, h, size)
        res = resize_bicubic_numpy(arr, nw, nh)
        top, left = center_crop_bounds(nw, nh, size)
        crop = res[max(top, 0): max(top, 0) + size,
                   max(left, 0): max(left, 0) + size].astype(np.uint8)
        return batcher(crop)

    server = make_server(db=InMemoryDB(), analyze_fn=analyze_bytes, port=0)
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        with open(f"{ref_root}/interior_sample.jpg", "rb") as f:
            payload = f.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze", data=payload, method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read().decode())
        assert "is_interior" in out and 0.0 <= out["interior_confidence"] <= 1.0
    finally:
        server.shutdown()
        batcher.close()


def test_ready_endpoint_gates_on_warmup(db_with_images):
    import threading

    warmed = threading.Event()
    server = make_server(db=db_with_images, port=0, ready_fn=warmed.is_set)
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        req = f"http://127.0.0.1:{port}/ready"
        with pytest.raises(urllib.error.HTTPError) as exc:  # not warm -> 503
            urllib.request.urlopen(req, timeout=5)
        assert exc.value.code == 503
        # /health stays liveness-only while warming
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=5) as r:
            assert r.status == 200
        warmed.set()
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.status == 200
            assert json.loads(r.read().decode())["ready"] is True
    finally:
        server.shutdown()


def test_hung_batch_times_out_without_wedging_batcher():
    """A dispatch that hangs must fail its requests with TimeoutError, fire
    the dead-letter hook, and leave the batcher serving subsequent batches."""
    import threading
    import time as _time

    first = threading.Event()
    dead = []

    def run_batch(items):
        if not first.is_set():
            first.set()
            _time.sleep(30)  # hung dispatch (abandoned daemon thread)
        return [int(x.sum()) for x in items]

    b = DynamicBatcher(
        run_batch, max_batch=4, max_wait_ms=5.0,
        batch_timeout_s=0.3, on_timeout=dead.append,
    )
    fut = b.submit(np.ones((2, 2), np.float32))
    with pytest.raises(TimeoutError):
        fut.result(timeout=10)
    assert dead == [1]
    # batcher still alive: next batch runs normally
    out = b.submit(np.ones((2, 2), np.float32)).result(timeout=10)
    assert out == 4
    b.close()


def test_analyze_timeout_returns_504_and_dead_letters(db_with_images):
    """POST /analyze through a hung analyzer: client gets 504 with
    dead_lettered=true instead of blocking forever."""
    import time as _time

    def analyze_fn(data: bytes):
        raise TimeoutError("request exceeded 0.1s")

    server = make_server(db=db_with_images, analyze_fn=analyze_fn, port=0)
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze", data=b"img", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=5)
        assert exc.value.code == 504
        body = json.loads(exc.value.read().decode())
        assert body["dead_lettered"] is True
    finally:
        server.shutdown()


def test_batcher_skips_cancelled_futures():
    """A client that cancels its future (client-side timeout) must not cost
    device compute: the batcher drops cancelled entries before running."""
    import time as _time

    from aiic_tpu.serve.batcher import DynamicBatcher

    ran = []

    def run_batch(items):
        ran.append(len(items))
        return [int(x.sum()) for x in items]

    b = DynamicBatcher(run_batch, max_batch=4, max_wait_ms=30.0)
    try:
        f1 = b.submit(np.ones((2, 2), np.uint8))
        f2 = b.submit(np.full((2, 2), 2, np.uint8))
        assert f1.cancel()  # abandoned before the batch forms
        assert f2.result(timeout=5.0) == 8
        _time.sleep(0.05)
        assert sum(ran) == 1  # only the live request was computed
        assert f1.cancelled()
    finally:
        b.close()


def test_batcher_admission_control_fast_fails():
    """Bounded queue (round-2 VERDICT wart #7): when max_queue undispatched
    requests are waiting, submit() raises BatcherOverloaded immediately
    instead of growing the queue past any survivable deadline."""
    from aiic_tpu.serve.batcher import BatcherOverloaded

    release = threading.Event()

    def run_batch(items):
        release.wait(5.0)
        return [0 for _ in items]

    b = DynamicBatcher(run_batch, max_batch=1, max_wait_ms=1.0, max_queue=2)
    try:
        f0 = b.submit(np.zeros(1))
        for _ in range(200):  # wait until f0 is dispatched (queue drained)
            if b._q.qsize() == 0:
                break
            time.sleep(0.01)
        f1 = b.submit(np.zeros(1))
        f2 = b.submit(np.zeros(1))
        with pytest.raises(BatcherOverloaded):
            b.submit(np.zeros(1))
        release.set()
        assert f0.result(5.0) == 0 and f1.result(5.0) == 0 and f2.result(5.0) == 0
        # after the backlog drains, admission opens again
        for _ in range(200):
            if b._q.qsize() == 0:
                break
            time.sleep(0.01)
        assert b.submit(np.zeros(1)).result(5.0) == 0
    finally:
        release.set()
        b.close()


def test_rest_overload_returns_503_with_retry_after(db_with_images):
    """POST /analyze maps BatcherOverloaded to 503 + Retry-After."""
    import urllib.error

    from aiic_tpu.serve.batcher import BatcherOverloaded

    def analyze_fn(data):
        raise BatcherOverloaded("request queue full (2); retry later")

    server = make_server(db=db_with_images, analyze_fn=analyze_fn, port=0)
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze", data=b"xx", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=5)
        assert ei.value.code == 503
        assert ei.value.headers.get("Retry-After") == "1"
        assert "queue full" in json.loads(ei.value.read().decode())["error"]
    finally:
        server.shutdown()


def test_batcher_admission_bound_is_exact_under_concurrency():
    """Concurrent submitters must not overshoot max_queue: the qsize check
    and the enqueue happen atomically under the admission lock."""
    import threading as th

    from aiic_tpu.serve.batcher import BatcherOverloaded

    release = th.Event()

    def slow_run(items):
        release.wait(5.0)
        return [None] * len(items)

    b = DynamicBatcher(slow_run, max_batch=1, max_wait_ms=1.0, max_queue=4)
    try:
        # occupy the dispatch slot so everything else stays queued
        first = b.submit(np.zeros(1))
        time.sleep(0.2)

        accepted, rejected = [], []
        start = th.Barrier(17)

        def worker():
            start.wait()
            try:
                accepted.append(b.submit(np.zeros(1)))
            except BatcherOverloaded:
                rejected.append(1)

        threads = [th.Thread(target=worker) for _ in range(16)]
        for t in threads:
            t.start()
        start.wait()
        for t in threads:
            t.join()
        assert b._q.qsize() <= 4, "admission bound overshot"
        assert len(accepted) + len(rejected) == 16
        assert len(rejected) >= 12
    finally:
        release.set()
        b.close()


def test_batcher_patch_wire_layout_matches_hwc():
    """The worker's patch-wire serving layout: rank-2 patch-major uint8
    items stack into rank-3 batches the classify program consumes directly;
    verdicts match the HWC uint8 wire."""
    from aiic_tpu.ops.preprocess import to_patch_major

    an_hwc = InteriorAnalyzer(config=TINY_TEST, training_data=TRAINING,
                              max_batch=8)
    an_pm = InteriorAnalyzer(config=TINY_TEST, training_data=TRAINING,
                             max_batch=8, wire_format="patch")
    rng = np.random.default_rng(5)
    s = TINY_TEST.image_size
    crops = rng.integers(0, 256, (5, s, s, 3), dtype=np.uint8)

    def run(an, items):
        batcher = DynamicBatcher(
            lambda px: list(an.classify_pixels(px)["top_idx"]),
            max_batch=8, max_wait_ms=5.0,
        )
        try:
            return [batcher(it) for it in items]
        finally:
            batcher.close()

    got_hwc = run(an_hwc, list(crops))
    got_pm = run(an_pm, list(to_patch_major(crops, TINY_TEST.patch_size)))
    assert [int(x) for x in got_hwc] == [int(x) for x in got_pm]


def test_analyze_batch_endpoint_schema_and_parity(analyzer, ref_root, tmp_path):
    """POST /analyze-batch (round-4 VERDICT #1): one request carries a whole
    image list — urls (the reference's production shape, main.py:516-524;
    local paths ride the same fetch_source) and base64 bytes — and returns
    full five-key reference result dicts in request order, with the
    reference load-error record for undecodable entries. The JPEG's batch
    result must equal its single POST /analyze result."""
    import base64

    from PIL import Image

    from aiic_tpu.serve.app import build_serving_app

    jpeg_path = f"{ref_root}/interior_sample.jpg"
    with open(jpeg_path, "rb") as f:
        jpeg = f.read()
    png_buf = tmp_path / "img.png"
    rng = np.random.default_rng(3)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(png_buf)
    png = png_buf.read_bytes()

    server, batcher, warmed = build_serving_app(
        analyzer, db=InMemoryDB(), port=0, max_batch=8, max_wait_ms=5.0,
        warm_buckets=(1, 2), warm_async=False, log=lambda *_: None)
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        payload = json.dumps({
            "urls": [jpeg_path],
            "images_b64": [
                base64.b64encode(jpeg).decode(),
                base64.b64encode(png).decode(),
                base64.b64encode(b"definitely not an image").decode(),
            ],
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze-batch", data=payload,
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read().decode())
        results = out["results"]
        assert len(results) == 4
        keys = {"is_interior", "interior_confidence", "detected_category",
                "analysis", "reason"}
        for res in results:
            assert set(res) == keys
        # url[0] and b64[0] are the same JPEG -> identical results
        assert results[0] == results[1]
        # undecodable bytes -> reference load-error record, request intact
        assert results[3]["detected_category"] == "load error"
        assert results[3]["is_interior"] is False
        assert results[3]["reason"].startswith("Błąd ładowania")

        # single-image endpoint must agree with the batch entry
        req1 = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze", data=jpeg, method="POST")
        with urllib.request.urlopen(req1, timeout=60) as r:
            single = json.loads(r.read().decode())
        assert single["is_interior"] == results[0]["is_interior"]
        assert single["detected_category"] == results[0]["detected_category"]
        np.testing.assert_allclose(single["interior_confidence"],
                                   results[0]["interior_confidence"], atol=1e-4)

        # live latency quantiles per endpoint (round-4 VERDICT weak #4)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=5) as r:
            snap = json.loads(r.read().decode())
        assert snap["analyze_batch_p50_ms"] > 0
        assert snap["analyze_p50_ms"] > 0
        assert snap["analyze_p95_ms"] >= snap["analyze_p50_ms"]

        # oversized batch -> 400 with a split-the-request hint
        too_big = json.dumps({"urls": ["x"] * 5000}).encode()
        req_big = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze-batch", data=too_big,
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req_big, timeout=10)
        assert exc.value.code == 400
    finally:
        server.shutdown()
        batcher.close()


def test_keepalive_early_return_post_does_not_desync():
    """Round-4 ADVICE (medium): early-return POST paths (404 route, no
    analyzer 503, bad length 400) must consume or kill the request body on
    a keep-alive connection — otherwise the unread bytes parse as the next
    request's start-line and every later response desyncs."""
    import http.client

    server = make_server(db=InMemoryDB(), port=0)  # no analyzer -> 503 path
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
        # 1) POST to an unknown route WITH a body
        conn.request("POST", "/nope", body=b"GET /health HTTP/1.1\r\n\r\nx" * 10)
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        # 2) POST /analyze with no analyzer attached (503) WITH a body
        conn.request("POST", "/analyze", body=b"some image bytes")
        r = conn.getresponse()
        assert r.status == 503
        r.read()
        # 3) same connection must still speak clean HTTP
        conn.request("GET", "/health")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read().decode())["status"] == "OK"
        conn.close()
    finally:
        server.shutdown()


def test_pipelined_hung_dispatch_times_out_without_wedging():
    """Round-4 ADVICE (medium): in pipelined mode the DISPATCH half gets the
    batch deadline too — a hung dispatch fails its futures and the collector
    keeps serving instead of wedging forever."""
    import time as _time

    first = threading.Event()
    dead = []

    def dispatch(items):
        if not first.is_set():
            first.set()
            _time.sleep(30)  # hung dispatch (relay stall / cold compile)
        return [int(x.sum()) for x in items]

    def fetch(handle):
        return handle

    b = DynamicBatcher(
        dispatch, fetch_batch=fetch, pipeline_depth=2,
        max_batch=4, max_wait_ms=5.0,
        batch_timeout_s=0.3, on_timeout=dead.append,
    )
    fut = b.submit(np.ones((2, 2), np.float32))
    with pytest.raises(TimeoutError):
        fut.result(timeout=10)
    assert dead == [1]
    # collector survived: the next batch dispatches and completes
    out = b.submit(np.ones((2, 2), np.float32)).result(timeout=10)
    assert out == 4
    b.close()


def test_latency_histogram_quantiles_accurate():
    """LatencyHistogram (the /metrics quantile backend) tracks numpy
    percentiles within its bucket-ratio error bound on a realistic
    heavy-tailed latency distribution."""
    from aiic_tpu.utils.profiling import LatencyHistogram

    rng = np.random.default_rng(0)
    samples = np.exp(rng.normal(np.log(0.030), 0.8, size=20_000))  # ~30ms median
    h = LatencyHistogram()
    for s in samples:
        h.record(float(s))
    for q in (0.50, 0.95, 0.99):
        est = h.quantile(q)
        true = float(np.percentile(samples, 100 * q))
        assert abs(est - true) / true < 0.08, (q, est, true)


def test_worker_crash_mid_apartment_recovers_exactly_once(analyzer, tmp_path):
    """Crash-recovery drill (round-4 VERDICT #3): kill the worker
    mid-apartment after k per-image DB updates, restart, re-drain. Every
    image must end 'completed'/'not_interior' EXACTLY once across both runs
    (no re-analysis of pre-crash work) and the restarted apartment aggregate
    must cover the WHOLE apartment, not just the re-drained remainder.
    Reference's entire recovery story: `restart: always`
    (docker-compose.yml:8) + status fields (main_API.py:78-91)."""
    from PIL import Image

    class WorkerKilled(BaseException):
        """Simulates the process dying (not caught by per-apartment
        exception isolation, which catches Exception only)."""

    class CrashingDB(InMemoryDB):
        """Raises mid-apartment after ``crash_after`` per-image updates."""

        def __init__(self):
            super().__init__()
            self.crash_after = None
            self.update_counts = {}

        def update_image_analysis(self, image_id, *a, **kw):
            super().update_image_analysis(image_id, *a, **kw)
            self.update_counts[image_id] = self.update_counts.get(image_id, 0) + 1
            if (self.crash_after is not None
                    and sum(self.update_counts.values()) >= self.crash_after):
                raise WorkerKilled()

    db = CrashingDB()
    db.insert_apartment("apt1", title="drill")
    rng = np.random.default_rng(11)
    for i in range(4):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(p)
        db.insert_image(f"img{i}", "apt1", str(p))

    # run 1: the worker dies after 2 per-image updates, before the aggregate
    db.crash_after = 2
    with pytest.raises(WorkerKilled):
        ApartmentWorker(db, analyzer).analyze_apartment("apt1")
    statuses = {i: im["analysis_status"] for i, im in db.images.items()}
    assert sum(s in ("completed", "not_interior") for s in statuses.values()) == 2
    assert sum(s == "pending" for s in statuses.values()) == 2
    assert db.analysis_results == {}  # died before the aggregate write

    # restart: a FRESH worker re-drains; only still-pending images are fetched
    db.crash_after = None
    out = process_apartments_pipeline(
        db=db, analyzer=analyzer, export_file=str(tmp_path / "export.json"),
        log=lambda *_: None)
    assert out is not None

    # exactly-once: every image analyzed once across both runs
    assert db.update_counts == {f"img{i}": 1 for i in range(4)}
    for im in db.images.values():
        assert im["analysis_status"] in ("completed", "not_interior")

    # the aggregate covers the whole apartment, folding pre-crash results in
    rec = db.analysis_results["apt1"]
    assert rec["total_images"] == 4
    n_completed = sum(
        im["analysis_status"] == "completed" for im in db.images.values())
    assert rec["analyzed_images"] == n_completed
    # nothing left for a third drain
    assert db.get_pending_apartments() == []


def test_analyze_batch_endpoint_with_http_urls(analyzer, ref_root):
    """POST /analyze-batch with http:// URLs (the reference's production
    shape — CSV of offer URLs, main.py:516-524): fetched concurrently over
    a loopback HTTP server, results equal the same images sent as bytes;
    a 404 URL yields the load-error record without failing the request."""
    import functools
    import os
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    from aiic_tpu.serve.app import build_serving_app

    paths = [f"{ref_root}/dataset_images/interior{i}.jpg" for i in (1, 2, 3)]

    class Quiet(SimpleHTTPRequestHandler):
        def log_message(self, *a):
            pass

    handler = functools.partial(Quiet, directory=f"{ref_root}/dataset_images")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    src_port = srv.server_address[1]

    server, batcher, _w = build_serving_app(
        analyzer, db=InMemoryDB(), port=0, max_batch=8, max_wait_ms=5.0,
        warm_buckets=(1, 4), warm_async=False, log=lambda *_: None)
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        urls = [f"http://127.0.0.1:{src_port}/{os.path.basename(p)}"
                for p in paths]
        bad = f"http://127.0.0.1:{src_port}/missing.jpg"
        import base64

        body = json.dumps({
            "urls": urls + [bad],
            "images_b64": [base64.b64encode(open(paths[0], "rb").read()).decode()],
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze-batch", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            results = json.loads(r.read().decode())["results"]
        assert len(results) == 5
        # url[0] and the b64 copy of the same JPEG agree
        assert results[0] == results[4]
        assert results[3]["detected_category"] == "load error"
        assert results[3]["reason"].startswith("Błąd ładowania")
        for res in results[:3]:
            assert set(res) == {"is_interior", "interior_confidence",
                                "detected_category", "analysis", "reason"}
    finally:
        server.shutdown()
        batcher.close()
        srv.shutdown()


def test_analyze_batch_chunks_large_pure_bytes_requests(analyzer, ref_root):
    """Pure-b64 requests larger than one decode chunk (64) keep request
    order across chunk boundaries and decode without the per-request
    stream thread (the >64-image handler-thread chunking path)."""
    import base64

    from aiic_tpu.serve.app import build_serving_app

    with open(f"{ref_root}/interior_sample.jpg", "rb") as f:
        jpeg = f.read()
    n = 70  # crosses the 64-image chunk boundary
    server, batcher, _w = build_serving_app(
        analyzer, db=InMemoryDB(), port=0, max_batch=8, max_wait_ms=5.0,
        warm_buckets=(1, 8), warm_async=False, max_batch_items=128,
        log=lambda *_: None)
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        imgs = [base64.b64encode(jpeg).decode()] * n
        # one bad entry straddling the second chunk keeps indexing honest
        imgs[66] = base64.b64encode(b"junk").decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze-batch",
            data=json.dumps({"images_b64": imgs}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            results = json.loads(r.read().decode())["results"]
        assert len(results) == n
        assert results[66]["detected_category"] == "load error"
        good = [r for i, r in enumerate(results) if i != 66]
        for res in good:
            assert res == good[0]  # same JPEG -> identical result everywhere
    finally:
        server.shutdown()
        batcher.close()


def test_analyze_batch_deadline_covers_slow_source_fetch(analyzer):
    """The batch request deadline covers the fetch/decode stream, not just
    the result wait: URL sources that stall must 504 at request_timeout
    instead of streaming for minutes first."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from aiic_tpu.serve.app import build_serving_app

    class Stall(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            time.sleep(1.0)  # each source takes 1 s; timeout is 1.5 s
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stall)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    src_port = srv.server_address[1]

    server, batcher, _w = build_serving_app(
        analyzer, db=InMemoryDB(), port=0, max_batch=8, max_wait_ms=5.0,
        request_timeout=1.5, warm_buckets=(1, 8), warm_async=False,
        log=lambda *_: None)
    port = server.server_address[1]
    serve_forever_in_thread(server)
    try:
        body = json.dumps({"urls": [
            f"http://127.0.0.1:{src_port}/{i}.jpg" for i in range(130)
        ]}).encode()  # >1 stream chunk of stalling sources
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze-batch", data=body,
            method="POST")
        t0 = time.perf_counter()
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        elapsed = time.perf_counter() - t0
        assert exc.value.code == 504
        body_json = json.loads(exc.value.read().decode())
        assert "timed out" in body_json["error"]
        # stream is 2 chunks of 64+66 sources at 1 s each through an
        # 8-worker fetch pool: unbounded would take ~17 s; the deadline is
        # chunk-granular, so the cutoff lands after chunk 1 (~8 s), well
        # before the full stream
        assert elapsed < 14.0, elapsed
    finally:
        server.shutdown()
        batcher.close()
        srv.shutdown()
