"""Real-weights arrival drill (round-2 VERDICT next-step #8).

ONE command that, given a pretrained CLIP ViT-B/16 checkpoint (HF directory)
and optionally the real BPE merges file, runs the full acceptance chain and
writes ``PARITY_REAL.md``:

1. tokenizer golden-token gate (activates only with the real merges file;
   sha256-enforced via AIIC_BPE_SHA256)
2. fp32 parity gate vs the torch oracle over all 150 reference images
   (target >= 0.999 logit cosine)
3. serving-config compound gate: bf16 + Pallas + int8 MLP/QKV weights vs
   the fp32 oracle (the exact bench.py configuration)
4. attribute-F1 over interior_dataset.json labels (BASELINE tracked metric)
5. REST serving burst: the full worker /analyze path (tools/rest_bench.py,
   decode + dynamic batcher + device program) at 1 and 8 clients — weights
   day yields parity + F1 + serving evidence in one run

Usage:
    python tools/real_weights_gate.py --weights <hf-checkpoint-dir> \
        [--merges <bpe_simple_vocab_16e6.txt.gz>] [--platform axon]

Rehearsal (no real weights in this container — verified round 1-3):
    python tools/real_weights_gate.py --rehearse
builds a seeded random-weight HF checkpoint with save_pretrained and runs
the identical chain against it, so weights day is a one-liner.
"""

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None, timeout=3600):
    e = dict(os.environ)
    e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
    if env:
        e.update(env)
    p = subprocess.run(cmd, cwd=REPO, env=e, capture_output=True, text=True,
                       timeout=timeout)
    return p.returncode, p.stdout, p.stderr


def last_json(stdout):
    """Parse the last JSON value in stdout — one-line (parity_report) or
    pretty-printed multi-line (eval_f1)."""
    text = stdout.strip()
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    # multi-line blob: parse from the first '{' that yields valid JSON
    for i, ch in enumerate(text):
        if ch == "{":
            try:
                return json.loads(text[i:])
            except json.JSONDecodeError:
                continue
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", help="HF CLIP checkpoint directory")
    ap.add_argument("--merges", help="real bpe_simple_vocab_16e6.txt.gz")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for the parity runs (axon = real TPU)")
    ap.add_argument("--rehearse", action="store_true",
                    help="build a seeded random-weight HF checkpoint and run "
                         "the identical chain (no real weights needed)")
    ap.add_argument("--out", default="PARITY_REAL.md")
    ap.add_argument("--limit", type=int, default=0,
                    help="limit images for a fast smoke (0 = all 150)")
    args = ap.parse_args()

    if not args.weights and not args.rehearse:
        ap.error("pass --weights <hf-dir> or --rehearse")

    weights = args.weights
    label = "REAL weights"
    if args.rehearse and not weights:
        weights = os.path.join(REPO, ".aiic_cache", "rehearsal_hf_ckpt")
        label = "REHEARSAL (seeded random weights)"
        if not os.path.exists(os.path.join(weights, "config.json")):
            print(f"building rehearsal checkpoint at {weights} ...")
            code = (
                "import sys; sys.path.insert(0, %r); sys.path.insert(0, %r)\n"
                "from test_parity_torch import _hf_vit_b16\n"
                "m = _hf_vit_b16()\n"
                "m.save_pretrained(%r)\n"
                "print('saved')\n"
            ) % (REPO, os.path.join(REPO, "tests"), weights)
            rc, out, err = run([sys.executable, "-c", code])
            if rc != 0:
                print(err, file=sys.stderr)
                sys.exit(1)

    results = {}

    # 1. tokenizer golden gate -------------------------------------------
    if args.merges:
        rc, out, err = run(
            [sys.executable, "-m", "pytest", "tests/test_tokenizer.py", "-q",
             "-k", "golden or sha256"],
            env={"AIIC_BPE_PATH": os.path.abspath(args.merges)},
        )
        lines = [ln for ln in out.strip().splitlines() if ln.strip()]
        tail = lines[-1] if lines else err.strip()[-300:]
        passed = rc == 0 and bool(lines) and "passed" in tail and "skipped" not in tail
        results["tokenizer_golden_gate"] = {
            "status": "PASS" if passed else "FAIL",
            "detail": tail,
        }
    else:
        results["tokenizer_golden_gate"] = {
            "status": "SKIPPED",
            "detail": "no --merges file given (the hermetic fallback "
                      "vocabulary stays active; real weights REQUIRE the "
                      "real merges file for correct text features)",
        }

    common = ["--weights", weights, "--platform", args.platform]
    if args.limit:
        common += ["--limit", str(args.limit)]

    # 2. fp32 parity gate -------------------------------------------------
    rc, out, err = run([sys.executable, "tools/parity_report.py", *common])
    j = last_json(out)
    results["fp32_parity_gate"] = {
        "status": ("PASS" if j and j.get("passes_0999_bar") else "FAIL"),
        "detail": j or (err[-400:] if rc else out[-400:]),
    }

    # 3. serving-config compound gate ------------------------------------
    rc, out, err = run([sys.executable, "tools/parity_report.py", *common,
                        "--dtype", "bfloat16", "--quantize",
                        "--attn-impl", "pallas"])
    j = last_json(out)
    results["serving_config_gate"] = {
        "status": ("PASS" if j and j.get("passes_0999_bar") else "FAIL"),
        "detail": j or (err[-400:] if rc else out[-400:]),
    }

    # 4. attribute F1 -----------------------------------------------------
    f1_cmd = [sys.executable, "tools/eval_f1.py", "--weights", weights,
              "--platform", args.platform]
    if args.limit:
        f1_cmd += ["--limit", str(args.limit)]
    rc, out, err = run(f1_cmd)
    j = last_json(out)
    results["attribute_f1"] = {
        "status": "OK" if j else "FAIL",
        "detail": j or (err[-400:] if rc else out[-400:]),
    }

    # 5. REST serving burst (round-3 VERDICT next-step #8: weights day
    # produces the full story — parity + F1 + serving — in one run) --------
    rest_cmd = [sys.executable, "tools/rest_bench.py", "--weights", weights,
                "--clients", "1,8", "--per-client", "6",
                "--max-wait-ms", "25"]
    if args.platform:
        rest_cmd += ["--platform", args.platform]
    rc, out, err = run(rest_cmd, timeout=5400)
    j = last_json(out)
    ok = rc == 0 and j and j.get("value", 0) > 0 and (
        j.get("best_point") or {}).get("errors", 1) == 0
    results["rest_serving_burst"] = {
        "status": "PASS" if ok else "FAIL",
        "detail": j or (err[-400:] if rc else out[-400:]),
    }

    # report --------------------------------------------------------------
    lines = [
        "# PARITY_REAL — pretrained-weights acceptance report",
        "",
        f"- run: {datetime.datetime.now().isoformat(timespec='seconds')}",
        f"- weights: `{weights}` ({label})",
        f"- merges: `{args.merges or 'NOT PROVIDED (hermetic fallback vocab)'}`",
        f"- platform: {args.platform}",
        "",
    ]
    overall = all(v["status"] in ("PASS", "OK", "SKIPPED")
                  for v in results.values())
    for name, v in results.items():
        lines.append(f"## {name}: **{v['status']}**")
        lines.append("")
        lines.append("```json" if isinstance(v["detail"], dict) else "```")
        lines.append(json.dumps(v["detail"], indent=2)
                     if isinstance(v["detail"], dict) else str(v["detail"]))
        lines.append("```")
        lines.append("")
    lines.append(f"**Overall: {'ACCEPTED' if overall else 'REJECTED'}**"
                 + (" (rehearsal run — numbers gate the machinery, not real "
                    "weights)" if label.startswith("REHEARSAL") else ""))
    lines.append("")
    with open(os.path.join(REPO, args.out), "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(json.dumps({
        "overall": "ACCEPTED" if overall else "REJECTED",
        **{k: v["status"] for k, v in results.items()},
        "report": args.out,
    }))
    sys.exit(0 if overall else 1)


if __name__ == "__main__":
    main()
