"""Production train-step throughput across graph scales — one v5e chip.

Extends bench.py's single (arxiv-shaped) headline with a small table:
medium-tier scale, the arxiv headline shape, and a pokec-fraction-scale
full-graph step, all on the production configuration (ssel slab plans,
bf16 activations, rbg dropout keys, fused multi-step blocks).  Timing
follows bench.py's protocol: k-step ``lax.scan`` blocks with the carried
train state blocked on (honest through the relay, see CLAUDE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_shapes.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from sgformer_tpu.utils import enable_compilation_cache

enable_compilation_cache()
assert jax.default_backend() == "tpu"

from sgformer_tpu.data.loaders import synthetic_dataset  # noqa: E402
from sgformer_tpu.graph import preprocess_graph  # noqa: E402
from sgformer_tpu.nn import SGFormer, SGFormerConfig  # noqa: E402
from sgformer_tpu.train.trainer import TrainConfig, Trainer  # noqa: E402
from sgformer_tpu.utils.rng import train_key  # noqa: E402

SHAPES = [
    ("medium-20K", 20_000, 120_000, 128, 16),
    ("arxiv-169K", 169_343, 1_166_243, 128, 40),
    ("large-400K", 400_000, 4_800_000, 128, 40),
]


def measure(name, n, e, f, c, k=10, blocks=3):
    t_host = time.perf_counter()
    ds = synthetic_dataset(num_nodes=n, num_edges=e, num_features=f,
                           num_classes=c, seed=0)
    graph = preprocess_graph(ds.graph["edge_index"], n, with_chunks=True,
                             spmm_mode="ssel")
    host_s = time.perf_counter() - t_host
    cfg = SGFormerConfig.large(256, c, trans_num_layers=1, gnn_num_layers=3,
                               graph_weight=0.5, compute_dtype="bf16")
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)
    trainer = Trainer(SGFormer(cfg), graph, ds.graph["node_feat"], ds.label,
                      tc)
    rng = train_key(0)
    t0 = time.perf_counter()
    state, tx, opt_state = trainer.init_state(rng)
    multi = trainer._build_multi_step(tx, k)
    train_idx = jnp.asarray(np.arange(0, n, 2, dtype=np.int32))
    state, opt_state, rng, losses = multi(state, opt_state, rng, train_idx)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(blocks):
        state, opt_state, rng, losses = multi(state, opt_state, rng,
                                              train_idx)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    step_ms = dt / (k * blocks) * 1e3
    eps = graph.num_edges * k * blocks / dt
    print(
        f"{name:12s} N={n:>7,} E={graph.num_edges:>10,}  "
        f"step {step_ms:7.2f} ms  {eps / 1e6:7.2f} M edges/s  "
        f"(host prep {host_s:.0f} s, compile+init {compile_s:.0f} s)",
        flush=True,
    )


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for shape in SHAPES:
        measure(*shape)
