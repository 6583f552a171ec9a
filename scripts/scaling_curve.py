"""Scaling-efficiency evidence without a multi-chip slice (round-4
VERDICT task 5): two falsifiable artifacts a future pod run can be
checked against.

Part A — measured functional curve: the REAL sharded train step
(`parallel/sharded.py`, halo exchange on) on a virtual CPU mesh at
sp=1/2/4/8.  CPU-mesh timings are NOT TPU-predictive (4 physical cores
serve all 8 virtual devices, and CPU collectives are memcpys), so this
part validates that the SPMD path runs and that per-device work shrinks
with the mesh; the numbers are recorded as correctness-grade only.

Part B — projected TPU efficiency table: combines
  * the MEASURED single-chip full-graph step time at 1M nodes/16M edges
    (scripts/soak_fullgraph_1m.py: 1.30 s/step, BENCH.md), assumed to
    split linearly across shards (the slab/ssel kernel is
    per-output-window, so shard compute is proportional to edges),
  * the MEASURED halo exchange volume of the contiguous+clustered
    partitioner on a power-law 1M graph (built here, host-side), and
  * the public TPU v5e ICI spec (1600 Gbps = 200 GB/s aggregate per
    chip; 70% achievable efficiency assumed),
into per-shard-count efficiency bounds: `overlap` assumes the halo
all_to_all fully overlaps the local SpMM (the implemented XLA-async
design, docs/MULTIHOST.md), `serial` assumes no overlap (worst case).

Run: python scripts/scaling_curve.py            (part B, host-only)
     python scripts/scaling_curve.py --cpu-mesh (also part A)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def part_a_cpu_mesh(sizes=(1, 2, 4, 8)):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sgformer_tpu.parallel.scaling import measure

    rows = []
    for n in sizes:
        r = measure(n, 100_000, 800_000, 128, steps=5, powerlaw=1.0,
                    use_halo=True, reorder=True)
        print(json.dumps(r), flush=True)
        rows.append(r)
    return rows


def part_b_projection(num_nodes=1_000_000, num_dir_edges=8_000_000,
                      hidden=256, gnn_layers=3,
                      step_s_1chip=1.30, ici_gbps=1600.0, ici_eff=0.70):
    import numpy as np

    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.parallel import partition_graph

    print(f"# building power-law graph N={num_nodes} E_dir={num_dir_edges}",
          file=sys.stderr, flush=True)
    ds = synthetic_dataset(num_nodes=num_nodes, num_edges=num_dir_edges,
                           num_features=8, num_classes=4, seed=0,
                           powerlaw=1.0)
    g = preprocess_graph(ds.graph["edge_index"], num_nodes, reorder=True)
    bytes_per_row = hidden * 2  # bf16 activations
    # propagates per train step: gnn_layers forward + gnn_layers transpose
    # in the backward pass; attention contributes one [H,M,D] psum (KB) and
    # the gradient all-reduce ~2 MB — both negligible next to row traffic
    passes = 2 * gnn_layers
    ici_bytes_per_s = ici_gbps / 8 * 1e9 * ici_eff
    rows = []
    for s in (2, 4, 8):
        sg = partition_graph(g, s, "sp", with_halo=True)
        halo_rows_per_chip = sg.halo_rows / s
        ag_rows_per_chip = num_nodes * (s - 1) / s
        t_halo = halo_rows_per_chip * bytes_per_row * passes / ici_bytes_per_s
        t_ag = ag_rows_per_chip * bytes_per_row * passes / ici_bytes_per_s
        t_comp = step_s_1chip / s
        row = {
            "shards": s,
            "halo_rows_per_chip_per_pass": int(halo_rows_per_chip),
            "allgather_rows_per_chip_per_pass": int(ag_rows_per_chip),
            "t_compute_s": round(t_comp, 4),
            "t_halo_ici_s": round(t_halo, 4),
            "t_allgather_ici_s": round(t_ag, 4),
            "eff_halo_overlap": round(t_comp / max(t_comp, t_halo), 3),
            "eff_halo_serial": round(t_comp / (t_comp + t_halo), 3),
            "eff_allgather_serial": round(t_comp / (t_comp + t_ag), 3),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cpu-mesh", action="store_true",
                   help="also run the measured virtual-mesh curve (part A)")
    args = p.parse_args()
    if args.cpu_mesh:
        part_a_cpu_mesh()
    part_b_projection()
