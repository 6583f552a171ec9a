"""Time/memory benchmark harness — the reference's only performance
machinery, rebuilt (``/root/reference/medium/time_test.py:153-270``):
train a fixed number of epochs without early stopping, then report total /
per-epoch train wall time, single no-grad forward latency, and device
memory.  Adds what the reference lacks: edges/sec and an optional
``jax.profiler`` trace."""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import numpy as np

from sgformer_tpu.utils.memory import device_memory_stats


@dataclasses.dataclass
class TimeTestResult:
    total_train_s: float
    per_epoch_ms: float
    forward_ms: float
    edges_per_sec: float
    peak_memory_mb: float

    def as_dict(self):
        return dataclasses.asdict(self)


def time_test(
    trainer,
    split_idx: dict,
    *,
    epochs: int = 50,
    warmup: int = 3,
    trace_dir: Optional[str] = None,
) -> TimeTestResult:
    """Benchmark ``trainer`` (a full-graph Trainer) for ``epochs`` steps.

    Matches ``medium/time_test.py`` semantics: pure training epochs (no
    eval inside the timed loop), then one timed no-grad forward.
    """
    from sgformer_tpu.utils.rng import train_key

    rng = train_key(trainer.config.seed, trainer.config.rng_impl)
    rng, init_rng = jax.random.split(rng)
    state, tx, opt_state = trainer.init_state(init_rng)
    train_step, eval_step = trainer._build_steps(tx)
    train_idx = trainer._prepare_train_idx(split_idx)

    for _ in range(warmup):
        rng, drop = jax.random.split(rng)
        state, opt_state, loss = train_step(state, opt_state, drop, train_idx)
    jax.block_until_ready(loss)

    ctx = (
        jax.profiler.trace(trace_dir) if trace_dir is not None else _null_ctx()
    )
    with ctx:
        t0 = time.perf_counter()
        for _ in range(epochs):
            rng, drop = jax.random.split(rng)
            state, opt_state, loss = train_step(state, opt_state, drop, train_idx)
        jax.block_until_ready(loss)
        total = time.perf_counter() - t0

    out = eval_step(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = eval_step(state)
    jax.block_until_ready(out)
    fwd = time.perf_counter() - t0

    num_edges = getattr(trainer.graph, "num_edges", 0) or getattr(
        trainer.graph, "total_nodes", 0
    )
    stats = device_memory_stats()
    return TimeTestResult(
        total_train_s=total,
        per_epoch_ms=1e3 * total / epochs,
        forward_ms=1e3 * fwd,
        edges_per_sec=num_edges * epochs / total if num_edges else 0.0,
        peak_memory_mb=stats.get("peak_bytes_in_use", 0) / 2**20,
    )


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
