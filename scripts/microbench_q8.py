"""int8 slab mode at the headline shape: does doubling the resident range
(R 24576 → 49152, enabled by int8 slab storage within the 13 MB VMEM cap)
buy back remote-gather time?

Measures the full production train step (bench.py protocol: fused 10-step
blocks, state blocked on) for:
  - bf16 slabs, R=24576   (the shipped default / headline)
  - int8 slabs, R=24576   (control: int8 dots alone)
  - int8 slabs, R=49152   (the locality lever)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_q8.py
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

N, E_dir = 169_343, 1_166_243


def measure(tag, slab_rows, slab_dtype, ds, k=10, blocks=3):
    geo = {} if slab_dtype == "compute" else {"slab_dtype": slab_dtype}
    t0 = time.perf_counter()
    graph = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                             spmm_mode="ssel", slab_rows=slab_rows,
                             slab_geometry=geo)
    prep = time.perf_counter() - t0
    remote = graph.chunks.fwd.remote
    slots = 0 if remote is None else int(np.prod(remote.gather_idx.shape[-2:]))
    cfg = SGFormerConfig.large(256, 40, trans_num_layers=1, gnn_num_layers=3,
                               graph_weight=0.5, compute_dtype="bf16")
    trainer = Trainer(SGFormer(cfg), graph, ds.graph["node_feat"], ds.label,
                      TrainConfig(lr=1e-3, trans_weight_decay=0.0,
                                  gnn_weight_decay=0.0))
    rng = train_key(0)
    state, tx, opt_state = trainer.init_state(rng)
    multi = trainer._build_multi_step(tx, k)
    idx = jnp.asarray(np.arange(0, N, 2, dtype=np.int32))
    state, opt_state, rng, _ = multi(state, opt_state, rng, idx)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(blocks):
        state, opt_state, rng, _ = multi(state, opt_state, rng, idx)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    steps = k * blocks
    print(
        f"{tag:22s} step {dt / steps * 1e3:7.2f} ms  "
        f"{graph.num_edges * steps / dt / 1e6:6.2f} M edges/s  "
        f"(prep {prep:.0f} s, remote slots {slots:,})",
        flush=True,
    )


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=128,
                           num_classes=40, seed=0)
    measure("bf16 R24576 (default)", 24576, "compute", ds)
    measure("int8 R24576 (control)", 24576, "int8", ds)
    measure("int8 R49152 (locality)", 49152, "int8", ds)
