"""Run every BASELINE config through bench.py and collect one JSON report.

Usage: python scripts/bench_all.py [--out docs/BENCH_RESULTS.json]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

CONFIGS = [None, "nafnet_denoise", "restormer_720p", "gan_sr_jpeg_batch",
           "agent_p50", "agent_p50_full", "diffbir_sr"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/BENCH_RESULTS.json")
    args = p.parse_args()

    results = {}
    for cfg in CONFIGS:
        cmd = [sys.executable, "bench.py"]
        name = cfg or "swinir_2k_sr(headline)"
        if cfg:
            cmd += ["--config", cfg]
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=3000)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        results[name] = {
            "result": json.loads(line) if line else None,
            "stderr_tail": proc.stderr.strip().splitlines()[-1:]
            if proc.stderr else [],
            "wall_s": round(time.time() - t0, 1),
            "rc": proc.returncode,
        }
        print(f"{name}: {results[name]['result']}", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
