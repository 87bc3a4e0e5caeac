"""Measure the single-core CPU baseline for bench.py's vs_baseline.

Builds and runs native/ref_model.cpp — a from-scratch C++ implementation of
the reference's MulRelinNew op sequence (distinct operands, PN15QP880,
gamma=2; see the .cpp header for the op-for-op mapping to
mkrlwe/keyswitch_hoisted.go) — and records the result in
BASELINE_MEASURED.json at the repo root.

The container has no Go toolchain, so the Go harness itself cannot run;
this model is the defensible substitute: identical NTT/pointwise operation
counts and arithmetic style (u64 Shoup/Montgomery), compiled with
g++ -O3 -march=native, which if anything FAVORS the baseline (gcc
auto-vectorizes parts the Go compiler would not), making vs_baseline
conservative.

Usage: python benchmarks/baseline_cpu.py [--parties 4] [--iters 3]
"""

import argparse
import json
import os
import platform
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "mkhe_tpu", "native", "ref_model.cpp")
OUT_JSON = os.path.join(ROOT, "BASELINE_MEASURED.json")


def build(exe: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-march=native", SRC, "-o", exe],
            check=True, capture_output=True, timeout=300)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        print(f"build failed: {e}", file=sys.stderr)
        return False


def run(exe: str, parties: int, iters: int):
    out = subprocess.run([exe, str(parties), str(iters)],
                         check=True, capture_output=True, text=True,
                         timeout=3600)
    return json.loads(out.stdout.strip())


def cpu_model() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor() or "unknown"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--parties", type=int, nargs="*", default=[2, 4])
    args = ap.parse_args()

    exe = "/tmp/mkhe_ref_model"
    if not build(exe):
        return 1
    results = {}
    for p in args.parties:
        r = run(exe, p, args.iters)
        results[f"mkckks_mulrelin_logn15_{p}party_ms"] = r["value"]
        print(json.dumps(r))
    doc = {
        "description": (
            "Single-core CPU measurement of the reference MulRelinNew op "
            "sequence (native/ref_model.cpp; distinct operands, PN15QP880, "
            "gamma=2, auto-rescale included). Regenerate with "
            "python benchmarks/baseline_cpu.py."),
        "cpu": cpu_model(),
        "compiler": "g++ -O3 -march=native",
        "results": results,
    }
    with open(OUT_JSON, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(f"wrote {OUT_JSON}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
