"""Benchmark harness: edges/sec/chip on the full jitted SGFormer train step.

Workload: an ogbn-arxiv-shaped synthetic graph (169,343 nodes; directed
edges symmetrized + self-loops like ``/root/reference/large/main.py:74-79``)
with the published arxiv recipe's model shape (hidden 256, 1 attention
layer, 3 GCN layers, ``large/run.sh:1-5``).  The metric counts processed
edges per wall-second of the COMPLETE train step (both branches fwd+bwd,
loss, Adam update, BN stats) — the reference's own benchmark harness
(``medium/time_test.py:218-228``) measures the same loop at the epoch level
but never committed numbers, so the baseline here is this framework's first
recorded TPU measurement (``bench_baseline.json``), making ``vs_baseline``
a cross-round progress ratio.

Robustness (round-4): the driver runs this under a hard timeout, so the
script (a) probes device liveness in a subprocess before touching jax —
a wedged chip fails loudly in seconds instead of hanging the whole run;
(b) logs each phase to stderr with elapsed time so a timeout tail is
diagnosable; (c) seeds the persistent compilation cache from the
committed ``bench_cache/`` directory so a fresh checkout compiles in
seconds instead of minutes; (d) tracks a wall-clock budget
(``BENCH_BUDGET_S``, default 480 s) and falls back to a coarse
single-dispatch measurement — printing SOME honest JSON always beats
rc=124.  ``BENCH_FAST=1`` forces the coarse path.

Prints exactly one JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

T0 = time.perf_counter()
REPO = os.path.dirname(os.path.abspath(__file__))


def log(msg: str) -> None:
    print(f"[bench] +{time.perf_counter() - T0:6.1f}s {msg}",
          file=sys.stderr, flush=True)


def probe_device(timeout_s: float = 240.0) -> None:
    """Fail fast (and loudly) if another process holds the exclusive TPU.

    ``jax.devices()`` from a fresh process HANGS until the holding process
    dies when the chip is busy (CLAUDE.md "ONE TPU process"), so the probe
    runs in a subprocess under a timeout: a wedge is reported in minutes
    with an actionable message instead of silently eating the driver's
    whole budget.  The timeout is generous because a HEALTHY first attach
    through the relay has measured anywhere from 0.1 s to ~45 s.
    """
    code = "import jax; d = jax.devices(); print(d[0].platform, len(d))"
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        log("FATAL: device probe hung for %.0fs — another process is "
            "holding the TPU (it is an exclusive-client device). Kill the "
            "holder by exact PID and re-run." % timeout_s)
        sys.exit(3)
    if out.returncode != 0:
        log("device probe exited rc=%d — continuing anyway\nstderr tail: %s"
            % (out.returncode, out.stderr.strip()[-500:]))
    else:
        log("device probe OK: %s" % out.stdout.strip())


def seed_compile_cache() -> None:
    """Copy the committed warm entries (bench_cache/) into the cache dir.

    The persistent-cache keys include jax/libtpu versions and compile
    options, so on the driver's environment (same image) these hit and a
    cold checkout's first compile drops from minutes to seconds; if the
    environment changed the keys simply miss and the budget fallback
    below covers the recompile.
    """
    src = os.path.join(REPO, "bench_cache")
    # shared resolution with utils.cache.enable_compilation_cache —
    # seeding a different directory than jax reads would silently
    # cold-compile (ADVICE round 4)
    from sgformer_tpu.utils.cache import resolve_cache_dir

    dst = resolve_cache_dir()
    if not os.path.isdir(src):
        return
    os.makedirs(dst, exist_ok=True)
    n = 0
    for name in os.listdir(src):
        d = os.path.join(dst, name)
        if not os.path.exists(d):
            shutil.copy2(os.path.join(src, name), d)
            n += 1
    log(f"seeded compile cache: {n} entries copied from bench_cache/")


def emit(edges_per_sec: float, coarse: bool) -> None:
    baseline_path = os.path.join(REPO, "bench_baseline.json")
    baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f).get("edges_per_sec")
    vs_baseline = edges_per_sec / baseline if baseline else 1.0
    log("measurement mode: %s" % ("coarse single-dispatch (budget fallback)"
                                  if coarse else "fused 10-step blocks"))
    print(
        json.dumps(
            {
                "metric": "sgformer_arxiv_trainstep_edges_per_sec_per_chip",
                "value": round(edges_per_sec, 1),
                "unit": "edges/s/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        ),
        flush=True,
    )


def main(dry: bool = False):
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "480"))
    fast = os.environ.get("BENCH_FAST", "0") == "1"
    if not dry:
        probe_device()
        seed_compile_cache()

    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.trainer import TrainConfig, Trainer

    num_nodes = 169_343
    num_directed_edges = 1_166_243
    if dry:
        # CI smoke: same code path end-to-end at toy scale (CPU-friendly)
        num_nodes, num_directed_edges = 2_000, 12_000
    log("phase: synthetic dataset build")
    ds = synthetic_dataset(
        num_nodes=num_nodes,
        num_edges=num_directed_edges,
        num_features=128,
        num_classes=40,
        seed=0,
    )
    # ssel slab mode: clustering reorder (~6 s host via csrc::lpa_cluster,
    # one-time preprocessing like the reference's to_undirected pass) +
    # gather-free local aggregation with host-prebuilt streamed selectors
    # (geometry sweep: scripts/microbench_slab_geom.py)
    log("phase: graph preprocessing (LPA cluster + slab plan, host)")
    graph = preprocess_graph(
        ds.graph["edge_index"], num_nodes, with_chunks=True,
        spmm_mode="ssel",
    )

    cfg = SGFormerConfig.large(
        256, 40, trans_num_layers=1, gnn_num_layers=3, graph_weight=0.5,
        compute_dtype="bf16",
    )
    model = SGFormer(cfg)
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)
    trainer = Trainer(model, graph, ds.graph["node_feat"], ds.label, tc)

    from sgformer_tpu.utils.rng import train_key

    rng = train_key(0)  # hardware rbg bit generation on TPU (utils/rng.py)
    log("phase: jitted init (params + opt state)")
    state, tx, opt_state = trainer.init_state(rng)
    train_step, _ = trainer._build_steps(tx)
    train_idx = jnp.asarray(np.arange(0, num_nodes, 2, dtype=np.int32))

    log("phase: train step compile + first run (minutes if cache cold)")
    state, opt_state, loss = train_step(state, opt_state, rng, train_idx)
    jax.block_until_ready(state)
    log("train step compiled and ran")

    # Coarse measurement: K async dispatches chained through the carried
    # state (each call's args differ, defeating the relay's memoization),
    # one block on the LARGE carried state (a small scalar may not sync
    # through the relay — CLAUDE.md).  Costs ~2.8 ms/dispatch over the
    # fused block but needs no extra compile.
    k_coarse = 2 if dry else 10
    t0 = time.perf_counter()
    for _ in range(k_coarse):
        state, opt_state, loss = train_step(state, opt_state, rng, train_idx)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    coarse_eps = graph.num_edges * k_coarse / dt
    log(f"coarse: {k_coarse} dispatched steps in {dt:.3f}s "
        f"= {coarse_eps:,.0f} edges/s")

    elapsed = time.perf_counter() - T0
    if fast or (not dry and elapsed > 0.55 * budget_s):
        log(f"budget fallback: elapsed {elapsed:.0f}s of {budget_s:.0f}s "
            "budget — emitting coarse number (set BENCH_BUDGET_S to raise)")
        emit(coarse_eps, coarse=True)
        return

    # Refined measurement — fused epoch blocks (Trainer._build_multi_step):
    # k train steps run as ONE lax.scan dispatch, exactly how fit()
    # executes between evals — and how any full-graph training loop should
    # run on TPU (no host round-trip per epoch; through this environment's
    # relay a dispatch costs ~2.8 ms on top of the step).
    k = 2 if dry else 10
    blocks = 1 if dry else 3
    log("phase: fused multi-step compile (lax.scan over the step)")
    multi_step = trainer._build_multi_step(tx, k)
    state, opt_state, rng, losses = multi_step(state, opt_state, rng,
                                               train_idx)
    jax.block_until_ready(state)
    log("multi-step compiled and ran; measuring %d blocks of %d" %
        (blocks, k))
    t0 = time.perf_counter()
    for _ in range(blocks):
        state, opt_state, rng, losses = multi_step(state, opt_state, rng,
                                                   train_idx)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    steps = k * blocks

    emit(graph.num_edges * steps / dt, coarse=False)


if __name__ == "__main__":
    main(dry="--dry" in sys.argv[1:])
