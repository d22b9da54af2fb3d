#!/usr/bin/env python
"""Benchmark: training throughput of the TPU-native Neural ADMIXTURE engine.

Headline metric (BASELINE.md): training samples/sec on a 1M-SNP workload
(single chip). Baseline for ``vs_baseline`` is the reference architecture's
throughput measured with torch on this host's CPU (the reference's own
non-CUDA execution path), on an identical down-scaled workload, extrapolated
per-step -- the only reference path runnable in this environment.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np

# Workload: aim for the BASELINE.json north-star shape (1M SNPs), sized to
# single-chip HBM. Overridable for smoke runs.
M = int(os.environ.get("NA_BENCH_M", 1_000_000))
N = int(os.environ.get("NA_BENCH_N", 4096))
K = int(os.environ.get("NA_BENCH_K", 8))
# Multi-head sweep: comma list of K values trained jointly (one head +
# decoder each, all sharing every pass's packed reads and unpack). Default:
# the single headline K.
KS = sorted(int(s) for s in
            os.environ.get("NA_BENCH_KS", str(K)).split(","))
B = int(os.environ.get("NA_BENCH_B", 800))
D = 8
H = 1024
# 5 = the production log period (TrainConfig.log_every): the engine runs
# one jit dispatch per period, so measuring 5 epochs in one grouped call
# reproduces the production dispatch:compute ratio exactly.
EPOCHS_MEASURE = int(os.environ.get("NA_BENCH_EPOCHS", 5))
TORCH_STEPS = int(os.environ.get("NA_BENCH_TORCH_STEPS", 3))


_PACKED_CACHE = {}


def make_synthetic_packed(n, m, k, seed=0):
    """Random genotypes -- content does not affect throughput, so plain
    uniform {0,1,2} keeps generation fast at biobank scale. Memoized: the
    single-head and multi-head measurements share the identical matrix
    (minutes of host generation at 1M SNPs otherwise repeat)."""
    key = (n, m, seed)
    if key in _PACKED_CACHE:
        return _PACKED_CACHE[key]
    rng = np.random.default_rng(seed)
    from neural_admixture_tpu.io.packed import pack_2bit_rows, packed_width
    m_pad = ((m + 2047) // 2048) * 2048
    packed = np.empty((n, packed_width(m_pad)), dtype=np.uint8)
    for i in range(0, n, 1024):
        G = rng.integers(0, 3, size=(min(1024, n - i), m), dtype=np.uint8)
        packed[i:i + 1024] = pack_2bit_rows(G, m_pad=m_pad)
    _PACKED_CACHE[key] = (packed, m_pad)
    return packed, m_pad


def bench_jax(KS=KS):
    import jax
    import optax

    from neural_admixture_tpu.utils.platform import (enable_compile_cache,
                                                     sync_platform_from_env)
    sync_platform_from_env()
    enable_compile_cache()

    from neural_admixture_tpu.models import qp
    from neural_admixture_tpu.ops import pack as pk
    from neural_admixture_tpu.train.engine import (NeuralAdmixtureTrainer,
                                                   make_epoch_fn,
                                                   make_stream_epoch_fn)

    pallas_env = os.environ.get("NA_BENCH_PALLAS")
    use_pallas = (jax.default_backend() in ("tpu", "axon")
                  if pallas_env is None else pallas_env == "1")
    # NA_BENCH_STREAM=1: measure the host-streaming (out-of-core) path
    # instead -- packed genotypes stay in host memory, each batch is
    # assembled on host and transferred per step (engine.
    # make_stream_epoch_fn). Expected to be transfer-bound; this knob
    # documents the out-of-core throughput, it is not the headline.
    stream = os.environ.get("NA_BENCH_STREAM") == "1"

    # Measured on v5e (2026-08-17, post wide-tb xv/dv): gathered blk=16
    # 93.1k samples/s; the opt-in gather-free indexed path (NA_TPU_INDEXED=1)
    # measured SLOWER (72.6k blk=16 / 82.5k blk=32 -- see PARITY.md). 16
    # matches the production CLI default (demo convergence proven
    # indistinguishable; tools/convergence_bench.py NA_CONV_BLOCK).
    blk = int(os.environ.get("NA_BENCH_BLOCK", 16))
    packed, m_pad = make_synthetic_packed(N, M, K)
    rng = np.random.default_rng(1)
    V = rng.normal(size=(D, M)).astype(np.float32) * 0.01
    P_init = rng.uniform(0.1, 0.9, size=(sum(KS), M)).astype(np.float32)

    params = qp.init_params(jax.random.PRNGKey(0), V.T, P_init, H, KS,
                            m_pad=m_pad)
    tx = optax.adam(2e-3, b1=0.9, b2=0.95, eps=1e-8)
    opt_state = tx.init(params)
    col_mask_np = (np.arange(m_pad) < M).astype(np.float32)
    if use_pallas:
        perm = pk.planar_perm(m_pad)
        params = NeuralAdmixtureTrainer._permute_params(params, perm)
        tiles = np.ascontiguousarray(
            pk.tiles_from_rows(pk.packed_view_u32(packed)))
        packed_dev = tiles if stream else jax.device_put(tiles)
        col_mask = jax.numpy.asarray(col_mask_np[perm])
    else:
        packed_dev = packed if stream else jax.device_put(packed)
        col_mask = jax.numpy.asarray(col_mask_np)
    pops = (np.zeros((N,), np.int32) if stream
            else jax.numpy.zeros((N,), jax.numpy.int32))

    # Block-granular sampling (the production default) needs the resident
    # rows padded to whole batches of whole blocks.
    n_rows = None
    if blk > 1:
        from neural_admixture_tpu.train.engine import block_geometry
        _, _, _, n_rows = block_geometry(N, B, use_pallas, None, blk)
        if n_rows != N:
            # sample axis: 1 in the tile-major (nT, N, 128) layout, else 0
            axis = 1 if packed_dev.ndim == 3 else 0
            pad_shape = list(packed_dev.shape)
            pad_shape[axis] = n_rows - N
            cat = np.concatenate if stream else jax.numpy.concatenate
            pad = np.zeros(pad_shape, packed_dev.dtype)
            packed_dev = cat(
                [packed_dev, pad if stream else jax.device_put(pad)],
                axis=axis)

    # Measure ONE TRUE PRODUCTION LOG PERIOD: the engine runs each period
    # (1 logged epoch -- merged loss+dq+dp kernel on the Pallas path --
    # followed by log_every-1 loss-free epochs) as one grouped jit dispatch
    # (engine.make_epoch_fn(epochs_per_call=E, period_len=E)); the bench's
    # default EPOCHS_MEASURE=5 with compute_loss=True reproduces that
    # dispatch:compute ratio AND epoch mix exactly. NA_BENCH_LOSSFREE=1
    # restores the pre-round-4 all-loss-free measurement (the cheapest
    # variant -- useful for kernel A/Bs, not the headline);
    # NA_BENCH_GROUP=0 measures per-epoch dispatch instead.
    group = (os.environ.get("NA_BENCH_GROUP", "1") == "1"
             and EPOCHS_MEASURE > 1 and not stream)
    lossfree = os.environ.get("NA_BENCH_LOSSFREE") == "1"
    no_missing = use_pallas and not pk.packed_has_missing(packed)
    if stream:
        mk = lambda **kw: make_stream_epoch_fn(  # noqa: E731
            tx, N, B, supervised=False, supervised_loss_weight=0.0,
            use_pallas=use_pallas, params_template=params,
            sample_block=blk, n_rows=n_rows, no_missing=no_missing, **kw)
        fast = mk(compute_loss=False)
        epoch_fns = [fast if lossfree else mk(compute_loss=True)] \
            + [fast] * (EPOCHS_MEASURE - 1)
    elif group:
        epoch_fn = make_epoch_fn(
            tx, N, B, supervised=False, supervised_loss_weight=0.0,
            use_pallas=use_pallas, compute_loss=not lossfree,
            params_template=params, sample_block=blk, n_rows=n_rows,
            no_missing=no_missing, epochs_per_call=EPOCHS_MEASURE,
            period_len=0 if lossfree else EPOCHS_MEASURE)
    else:
        mk = lambda **kw: make_epoch_fn(  # noqa: E731
            tx, N, B, supervised=False, supervised_loss_weight=0.0,
            use_pallas=use_pallas, params_template=params,
            sample_block=blk, n_rows=n_rows, no_missing=no_missing, **kw)
        fast = mk(compute_loss=False)
        epoch_fns = [fast if lossfree else mk(compute_loss=True)] \
            + [fast] * (EPOCHS_MEASURE - 1)
    key = jax.random.PRNGKey(42)

    def run_epochs(params, opt_state, key):
        if group:
            return epoch_fn(params, opt_state, packed_dev, col_mask, pops,
                            jax.random.split(key, EPOCHS_MEASURE))[:2]
        for fn in epoch_fns:
            key, ke = jax.random.split(key)
            params, opt_state, _ = fn(params, opt_state, packed_dev,
                                      col_mask, pops, ke)
        return params, opt_state

    # NOTE: sync via a scalar value fetch from the updated params --
    # block_until_ready is a no-op on some experimental PJRT backends,
    # and only an actual device->host read is a reliable barrier.
    def sync(params):
        return float(jax.numpy.sum(params["rmsnorm"]["weight"]))

    # Warm-up / compile.
    key, kw = jax.random.split(key)
    params, opt_state = run_epochs(params, opt_state, kw)
    sync(params)

    t0 = time.time()
    params, opt_state = run_epochs(params, opt_state, key)
    sync(params)
    dt = time.time() - t0
    steps_per_epoch = (n_rows if n_rows else N) // B
    stats = {
        "backend": jax.default_backend(),
        "steps_per_epoch": steps_per_epoch,
        "step_ms": dt / (EPOCHS_MEASURE * max(1, steps_per_epoch)) * 1e3,
        "m_pad": m_pad,
        "sum_ks": sum(KS),
    }
    return N * EPOCHS_MEASURE / dt, stats


def pinned_baseline():
    """The torch-CPU reference throughput pinned by
    tools/pin_bench_baseline.py (median of 5 x 10-step runs), rescaled to
    the current M (per-step cost is M-proportional). None when no pin
    exists or the pinned workload's other knobs (B/D/H/KS) differ --
    callers then fall back to a live measurement. Pinning exists because
    the live 3-step re-measure scattered +/-40% across driver rounds,
    swinging vs_baseline 550x -> 2480x on a flat engine number."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bench_baseline.json")
    try:
        with open(path) as fh:
            rec = json.load(fh)
    except (OSError, ValueError):
        return None
    w = rec.get("workload", {})
    if (w.get("B"), w.get("D"), w.get("H"), w.get("KS")) != (B, D, H, KS):
        return None
    return float(rec["samples_per_sec"]) * (float(w["M"]) / M)


def bench_torch_baseline():
    """Reference-architecture step in torch (CPU).

    Measured at min(M, 131072) SNPs and scaled linearly to M (every
    M-proportional term dominates the step), keeping the baseline run
    time-boxed at biobank scale.
    """
    try:
        import torch
    except ImportError:
        return None
    torch.manual_seed(0)
    m = min(M, 131072)
    X = torch.randint(0, 3, (B, m), dtype=torch.uint8)

    V = torch.nn.Parameter(torch.randn(m, D) * 0.01)
    norm = torch.nn.RMSNorm(D, eps=1e-8)
    common = torch.nn.Sequential(torch.nn.Linear(D, H), torch.nn.ReLU())
    heads = [torch.nn.Linear(H, k) for k in KS]
    decs = [torch.nn.Linear(k, m, bias=False) for k in KS]
    with torch.no_grad():
        for dec in decs:
            dec.weight.uniform_(0.1, 0.9)
    params = [V] + list(norm.parameters()) + list(common.parameters())
    for mod in heads + decs:
        params += list(mod.parameters())
    opt = torch.optim.Adam(params, lr=2e-3, betas=(0.9, 0.95))
    lossf = torch.nn.BCELoss(reduction="sum")

    def step():
        opt.zero_grad(set_to_none=True)
        x = X.float() / 2
        x = torch.where(x == 1.5, torch.tensor(0.0), x)
        h = common(norm(x @ V))
        loss = sum(
            lossf(torch.clamp(dec(torch.softmax(head(h), dim=1)), 0, 1), x)
            for head, dec in zip(heads, decs))
        loss.backward()
        opt.step()
        with torch.no_grad():
            for dec in decs:
                dec.weight.clamp_(0, 1)

    step()  # warm-up
    t0 = time.time()
    for _ in range(TORCH_STEPS):
        step()
    dt = time.time() - t0
    return (B * TORCH_STEPS / dt) * (m / M)


def roofline(stats):
    """Distance-from-wall keys for the driver artifact (model-based, per
    VERDICT r4 #8): the measured per-step time against (a) the v5e VPU
    unpack+draw arithmetic floor of the dominant dq_dp kernel (~15 VPU
    ops/genotype at ~3.85 f32 Tops/s -- the measured single-chip wall,
    PARITY.md round-2/round-4 kernel ledger) and (b) a per-step HBM
    traffic model: 5 packed-batch passes of 0.25 B/genotype (gather
    read+write + xv/dq_dp/dv kernel reads) plus ~9 f32 array passes over
    P and V (kernel read, grad write, Adam read p/g/m/v + write p/m/v)
    against the v5e's 819 GB/s. Only meaningful on the TPU backend."""
    B_, m_pad, sk = B, stats["m_pad"], stats["sum_ks"]
    step_s = stats["step_ms"] / 1e3
    vpu_floor_ms = 15 * B_ * m_pad / 3.85e12 * 1e3
    hbm_bytes = int(1.25 * B_ * m_pad + 9 * 4 * (sk + D) * m_pad)
    return {
        "step_ms": round(stats["step_ms"], 3),
        "steps_per_epoch": stats["steps_per_epoch"],
        "vpu_draw_floor_ms": round(vpu_floor_ms, 3),
        "vpu_floor_frac": round(vpu_floor_ms / 1e3 / step_s, 3),
        "hbm_bytes_per_step_model": hbm_bytes,
        "hbm_GBps_achieved": round(hbm_bytes / step_s / 1e9, 1),
        "hbm_peak_frac": round(hbm_bytes / step_s / 819e9, 3),
    }


def main():
    t0 = time.time()
    sps, stats = bench_jax()
    # vs_baseline uses the PINNED torch-CPU reference number when the
    # workload matches the pin (tools/bench_baseline.json); otherwise --
    # or with NA_BENCH_LIVE_BASELINE=1, reported separately -- the live
    # re-measure. NA_BENCH_NO_TORCH=1 skips the live leg entirely.
    base, base_src = pinned_baseline(), "pinned"
    live = None
    if os.environ.get("NA_BENCH_NO_TORCH", "0") != "1" and (
            base is None or os.environ.get("NA_BENCH_LIVE_BASELINE") == "1"):
        live = bench_torch_baseline()
    if base is None:
        base, base_src = live, "live"
    vs = (sps / base) if base else None
    k_tag = (f"K{KS[0]}" if len(KS) == 1
             else f"K{KS[0]}-{KS[-1]}x{len(KS)}heads")
    out = {
        "metric": f"train_samples_per_sec_{M//1000}kSNP_{k_tag}",
        "value": round(sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "baseline_samples_per_sec": round(base, 2) if base else None,
        "baseline_source": base_src if base else None,
    }
    if live is not None and base_src == "pinned":
        out["baseline_live_samples_per_sec"] = round(live, 2)
    if stats["backend"] in ("tpu", "axon"):
        out["roofline"] = roofline(stats)
    # Second headline: the multi-head K sweep (--min_k/--max_k), the real
    # ADMIXTURE workflow (reference entry.py:33-34 defaults K=2..10 when no
    # single K is given). All heads share each pass's packed reads and
    # in-kernel unpack, so the sweep amortizes: BASELINE.md tracks
    # samples/s-per-head. Skipped when NA_BENCH_KS pins an explicit K list
    # or NA_BENCH_MULTIHEAD=0 (smoke runs). DEADLINE-GUARDED: the primary
    # headline must never be lost to an external timeout on a slow/cold
    # tunnel, so the sweep only starts while elapsed < NA_BENCH_MH_DEADLINE_S
    # and is additionally bounded by SIGALRM -- on expiry the JSON ships
    # without the multi_head key.
    deadline = float(os.environ.get("NA_BENCH_MH_DEADLINE_S", "300"))
    mh_wanted = ("NA_BENCH_KS" not in os.environ
                 and os.environ.get("NA_BENCH_MULTIHEAD", "1") == "1")
    if mh_wanted and time.time() - t0 >= deadline:
        # visible, not silently absent, when the primary leg ate the budget
        out["multi_head"] = "skipped: deadline"
    if mh_wanted and time.time() - t0 < deadline:
        import signal

        class _MhTimeout(Exception):
            pass

        def _on_alarm(signum, frame):
            raise _MhTimeout()

        ks_sweep = list(range(2, 11))
        try:
            prev = signal.signal(signal.SIGALRM, _on_alarm)
            signal.alarm(int(os.environ.get("NA_BENCH_MH_TIMEOUT_S", "240")))
        except ValueError:  # not the main thread: run unbounded
            prev = None
        try:
            sps_mh, _ = bench_jax(KS=ks_sweep)
            out["multi_head"] = {
                "ks": f"{ks_sweep[0]}-{ks_sweep[-1]}",
                "heads": len(ks_sweep),
                "samples_per_sec": round(sps_mh, 2),
                "head_samples_per_sec": round(sps_mh * len(ks_sweep), 2),
                "cost_vs_single_head": round(sps / sps_mh, 2),
            }
        except _MhTimeout:
            out["multi_head"] = "skipped: deadline"
        finally:
            if prev is not None:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, prev)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
