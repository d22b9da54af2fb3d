#!/usr/bin/env python
"""Measure the torch-CPU reference baseline properly and PIN it.

bench.py's ``vs_baseline`` used to re-measure the torch reference leg on
every run with 3 steps; host jitter made the implied baseline scatter
+/-40% across driver rounds (49.6 / 66.4 / 41.0 samples/s in r01/r03/r04),
so the headline ratio swung 550x -> 2480x while the engine number was
flat. This script measures the same ``bench.bench_torch_baseline``
workload as the median of NA_PIN_RUNS (default 5) independent runs of
NA_PIN_STEPS (default 10) timed steps each, and writes
``tools/bench_baseline.json``; bench.py then reports ``vs_baseline``
from the pinned number whenever the workload matches (a live re-measure
stays available via NA_BENCH_LIVE_BASELINE=1, reported separately).

Run from the repo root: ``python tools/pin_bench_baseline.py``.
"""
import json
import os
import platform
import statistics
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["NA_BENCH_TORCH_STEPS"] = os.environ.get("NA_PIN_STEPS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    import torch

    runs = int(os.environ.get("NA_PIN_RUNS", 5))
    vals = []
    for r in range(runs):
        t0 = time.time()
        v = bench.bench_torch_baseline()
        print(f"run {r + 1}/{runs}: {v:.2f} samples/s "
              f"({time.time() - t0:.1f}s)", file=sys.stderr)
        vals.append(v)
    pinned = statistics.median(vals)
    rec = {
        "metric": "torch_cpu_reference_samples_per_sec",
        "samples_per_sec": round(pinned, 3),
        "runs": [round(v, 3) for v in vals],
        "steps_per_run": int(os.environ["NA_BENCH_TORCH_STEPS"]),
        "workload": {"M": bench.M, "B": bench.B, "D": bench.D,
                     "H": bench.H, "KS": bench.KS,
                     "snps_measured": min(bench.M, 131072)},
        "host": {"cpus": os.cpu_count(),
                 "torch": torch.__version__,
                 "torch_threads": torch.get_num_threads(),
                 "platform": platform.platform()},
        "pinned_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_baseline.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
