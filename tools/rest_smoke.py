"""REST readiness smoke: start the worker CLI with --serve, poll /ready, and
time the FIRST POST /analyze after readiness — it must not hit a compile
stall (the warmup precompiled every bucket). Prints one JSON line.

    python tools/rest_smoke.py [port] [extra worker args...]

e.g. ``python tools/rest_smoke.py 3378 --wire-format patch --quantize``
drives the int8 + patch-major-wire serving config through the REST surface.

Uses SIGTERM (never SIGKILL) to stop the server: a hard-killed TPU client
leaves a stale device claim on this container's relay.
"""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 3377
    extra = sys.argv[2:]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "aiic_tpu.cli.worker", "--serve",
         "--port", str(port), "--dataset-json",
         "/root/reference/interior_dataset.json", *extra],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        # liveness first (server binds before the model warms)
        t0 = time.time()
        while True:
            try:
                urllib.request.urlopen(base + "/health", timeout=2)
                break
            except Exception:
                if proc.poll() is not None:
                    raise RuntimeError(f"server died rc={proc.returncode}")
                if time.time() - t0 > 420:
                    # engine construction (text-feature precompute on the
                    # chip) runs before the server binds — ~2 min typical
                    raise RuntimeError("server never became live")
                time.sleep(0.5)
        live_after = time.time() - t0

        # readiness flips when warmup (text cache + bucket precompile) is done
        ready_wait_t0 = time.time()
        while True:
            try:
                with urllib.request.urlopen(base + "/ready", timeout=5) as r:
                    if json.loads(r.read().decode()).get("ready"):
                        break
            except urllib.error.HTTPError as e:
                if e.code != 503:
                    raise
            except Exception:
                pass
            if time.time() - ready_wait_t0 > 900:
                raise RuntimeError("server never became ready")
            time.sleep(1.0)
        ready_after = time.time() - ready_wait_t0

        with open("/root/reference/interior_sample.jpg", "rb") as f:
            img = f.read()
        req = urllib.request.Request(base + "/analyze", data=img, method="POST")
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read().decode())
        first_ms = (time.perf_counter() - t0) * 1e3

        # a few more to get a steady p50
        lats = []
        for _ in range(5):
            t0 = time.perf_counter()
            urllib.request.urlopen(
                urllib.request.Request(base + "/analyze", data=img, method="POST"),
                timeout=60,
            ).read()
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()

        # batch protocol: one POST carries several images (round-5 surface)
        import base64

        breq = urllib.request.Request(
            base + "/analyze-batch",
            data=json.dumps({
                "images_b64": [base64.b64encode(img).decode()] * 4
            }).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        t0 = time.perf_counter()
        with urllib.request.urlopen(breq, timeout=60) as r:
            batch_out = json.loads(r.read().decode())["results"]
        batch_ms = (time.perf_counter() - t0) * 1e3
        full_keys = {"is_interior", "interior_confidence", "detected_category",
                     "analysis", "reason"}
        schema_ok = (set(out) == full_keys
                     and all(set(r) == full_keys for r in batch_out))

        with urllib.request.urlopen(base + "/dead-letters", timeout=10) as r:
            dl = json.loads(r.read().decode())

        with urllib.request.urlopen(base + "/metrics", timeout=10) as r:
            metrics = json.loads(r.read().decode())
        stages = {k: v for k, v in metrics.items() if k.startswith("stage_")}

        print(json.dumps({
            "metric": "rest_first_request_after_ready_ms",
            "value": round(first_ms, 1),
            "live_after_s": round(live_after, 1),
            "ready_after_s": round(ready_after, 1),
            "steady_p50_ms": round(lats[len(lats) // 2], 1),
            "no_cold_start_stall": first_ms < 5000.0,
            "is_interior": out.get("is_interior"),
            "batch_results": len(batch_out),
            "batch_ms": round(batch_ms, 1),
            "full_reference_schema": schema_ok,
            "dead_letters_queryable": "dead_letters" in dl,
            "latency_quantiles_present": "analyze_p50_ms" in metrics,
            "stage_timings": stages,
            "stages_present": any(k.startswith("stage_serve_decode") for k in stages)
            and any(k.startswith("stage_dispatch") for k in stages),
        }))
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            print("WARNING: server did not exit on SIGTERM", file=sys.stderr)


if __name__ == "__main__":
    main()
