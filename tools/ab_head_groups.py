"""A/B the multi-head heavy-kernel widening levers on the bench workload
(VERDICT r4 #7).

Two levers, both trace-time env knobs:
  - NA_TPU_HEAD_GROUPS=S: split heads across S heavy pallas calls (extra
    packed read + re-unpack per extra group, wider tiles per group).
  - raised scoped-VMEM allowance (_heavy_vmem_limit): lets WIDE tiles
    compile at all -- including all-heads-one-call at tb=400/800, keeping
    the single packed read, and the single-head tb=800 program previously
    recorded as a compile wall (fused.pick_tb docstring, 20.05M > 16M).

Runs bench.bench_jax (production grouped-dispatch log-period measurement)
over the leg matrix with INTERLEAVED repeats (tunnel variance -- PARITY
round-2 methodology). Legs that fail to compile are recorded as such and
the sweep continues. Env is read at trace time; every call re-traces.

Usage: python tools/ab_head_groups.py [reps]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NA_BENCH_KS", "8")          # silence the default
os.environ.setdefault("NA_BENCH_NO_TORCH", "1")    # multi-head auto leg

import bench  # noqa: E402

MH = list(range(2, 11))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
# (name, KS, env overrides). NA_TPU_TB_HEAVY raises the tile cap for ALL
# heavy calls; NA_TPU_HEAD_GROUPS splits them. The raised VMEM allowance
# engages automatically whenever the (heads+1)*tb*TM*4 estimate outgrows
# the 16M default (ops.fused_step._heavy_vmem_limit).
# NOTE: the measurements recorded in PARITY round-5 ran BEFORE commit
# a51a654 flipped the multi-head default cap to 400; since then the
# empty-env multi-head leg compiles the tb=400 program, so the pre-r5
# tb=200 baseline needs NA_TPU_TB_HEAVY=256 pinned explicitly.
LEGS = [
    ("mh_tb256_pre_r5_default", MH, {"NA_TPU_TB_HEAVY": "256"}),
    ("mh_1call_tb400_default", MH, {}),
    ("mh_2groups_tb400", MH, {"NA_TPU_HEAD_GROUPS": "2"}),
    ("mh_1call_tb800", MH, {"NA_TPU_TB_HEAVY": "800"}),
    ("sh_default_tb400", [8], {}),
    ("sh_tb800", [8], {"NA_TPU_TB_HEAVY": "800"}),
]
_KNOBS = ("NA_TPU_TB_HEAVY", "NA_TPU_HEAD_GROUPS", "NA_TPU_VMEM_LIMIT_MB")


def main():
    results = {name: [] for name, _, _ in LEGS}
    failed = set()
    for rep in range(REPS):
        for name, ks, env in LEGS:
            if name in failed:
                continue
            for k in _KNOBS:
                os.environ.pop(k, None)
            os.environ.update(env)
            try:
                sps, stats = bench.bench_jax(KS=ks)
            except Exception as e:  # compile walls are data, not aborts
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
