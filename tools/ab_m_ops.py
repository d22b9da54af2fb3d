"""A/B M-tile batching (ops.fused_step.pick_m / NA_TPU_M_OPS) on the
single-head bench workload.

At the bench shape (1M SNPs -> nT=489=3*163 planar tiles, B=800, tb=400)
NA_TPU_M_OPS=8 picks 3 tiles per grid step in every packed-plane kernel,
cutting grid steps 3x: xv 489->163, dq_dp 978->326, dv 489->163 per step,
against the measured ~0.4-0.5 us fixed cost per grid step (PARITY round-2
cost model). Multi-head at 9 heads keeps m_ops=1 (VMEM budget), so only
the single-head headline is at stake. Interleaved repeats.

MEASURED NEUTRAL (2026-08-20, 3 reps: 98.2-103.5k samples/s m=1 vs
99.3-101.6k m=3) -- that measurement ran while m batching was default-ON;
the default has since been flipped to opt-in, so the enabled leg here
now sets NA_TPU_M_OPS=8 explicitly (env unset would measure the m=1
program twice and report noise as a comparison).

Usage: python tools/ab_m_ops.py [reps]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NA_BENCH_KS", "8")
os.environ.setdefault("NA_BENCH_NO_TORCH", "1")

import bench  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
LEGS = [("sh_m1", {"NA_TPU_M_OPS": "1"}),
        ("sh_m3", {"NA_TPU_M_OPS": "8"})]


def main():
    results = {name: [] for name, _ in LEGS}
    failed = set()
    for rep in range(REPS):
        for name, env in LEGS:
            if name in failed:
                continue
            os.environ.pop("NA_TPU_M_OPS", None)
            os.environ.update(env)
            try:
                sps, stats = bench.bench_jax(KS=[8])
            except Exception as e:
                failed.add(name)
                print(json.dumps({"rep": rep, "leg": name,
                                  "error": str(e)[:300]}), flush=True)
                continue
            results[name].append(round(sps, 1))
            print(json.dumps({"rep": rep, "leg": name,
                              "samples_per_sec": round(sps, 1),
                              "step_ms": round(stats["step_ms"], 3)}),
                  flush=True)
    print(json.dumps({"best": {n: max(v) for n, v in results.items() if v},
                      "all": results}), flush=True)


if __name__ == "__main__":
    main()
