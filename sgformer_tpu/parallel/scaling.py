"""Scaling-efficiency harness: edges/s for the SPMD train step at
1..N devices (BASELINE.md north star: >=80% edges/s efficiency 1 host →
4 hosts).  With one physical chip this reports the single-chip number and
validates the collective path on a virtual mesh; on a pod slice it
measures the real curve.

    python -m sgformer_tpu.parallel.scaling --devices 1 2 4 8 \
        --nodes 100000 --edges 800000 [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(n_devices: int, num_nodes: int, num_edges: int, hidden: int,
            steps: int = 10, powerlaw: float = 0.0,
            use_halo: bool = False, reorder: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.parallel import make_mesh, partition_graph
    from sgformer_tpu.parallel.partition import (
        idx_to_mask,
        node_mask_for,
        pad_to_shards,
    )
    from sgformer_tpu.parallel.sharded import make_sharded_steps
    from sgformer_tpu.train.optim import dual_weight_decay_adam

    devs = jax.devices()[:n_devices]
    mesh = make_mesh((n_devices,), ("sp",), devices=devs)
    ds = synthetic_dataset(num_nodes=num_nodes, num_edges=num_edges,
                           num_features=128, num_classes=16, seed=0,
                           powerlaw=powerlaw)
    graph = preprocess_graph(ds.graph["edge_index"], num_nodes,
                             reorder=reorder)
    sg = partition_graph(graph, n_devices, "sp", with_halo=use_halo)

    model = SGFormer(SGFormerConfig.large(hidden, 16, axis_name="sp"))
    x = jnp.asarray(pad_to_shards(ds.graph["node_feat"], sg.total_nodes))
    nmask = jnp.asarray(node_mask_for(num_nodes, sg.total_nodes))
    tmask = jnp.asarray(idx_to_mask(np.arange(0, num_nodes, 2), sg.total_nodes))
    label = jnp.asarray(pad_to_shards(
        np.asarray(ds.label).reshape(-1).astype(np.int32), sg.total_nodes))

    from jax.sharding import PartitionSpec as P

    variables = jax.jit(jax.shard_map(
        lambda r, xx, g, nm: model.init(
            {"params": r}, xx, g.local(), train=False, node_mask=nm),
        mesh=mesh,
        in_specs=(P(), P("sp", None), P("sp"), P("sp")),
        out_specs=P(), check_vma=False,
    ))(jax.random.PRNGKey(0), x, sg, nmask)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = dual_weight_decay_adam(params, 1e-3, 0.0, 0.0)
    opt = tx.init(params)
    train_step, _ = make_sharded_steps(model, tx, mesh, "sp")

    rng = jax.random.PRNGKey(1)
    params, bs, opt, loss = train_step(params, bs, opt, rng, tmask, x, sg,
                                       label, nmask)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, bs, opt, loss = train_step(params, bs, opt, rng, tmask, x,
                                           sg, label, nmask)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / steps
    return {
        "devices": n_devices,
        "step_ms": round(dt * 1e3, 2),
        "edges_per_sec": round(graph.num_edges / dt, 1),
        "edges_per_sec_per_device": round(graph.num_edges / dt / n_devices, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1])
    p.add_argument("--nodes", type=int, default=100_000)
    p.add_argument("--edges", type=int, default=800_000)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--powerlaw", type=float, default=0.0)
    p.add_argument("--halo", action="store_true")
    p.add_argument("--reorder", action="store_true")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    results = []
    for n in args.devices:
        r = measure(n, args.nodes, args.edges, args.hidden,
                    powerlaw=args.powerlaw, use_halo=args.halo,
                    reorder=args.reorder)
        results.append(r)
        print(json.dumps(r))
    if len(results) > 1:
        base = results[0]["edges_per_sec_per_device"]
        for r in results[1:]:
            eff = r["edges_per_sec_per_device"] / base
            print(json.dumps({"devices": r["devices"],
                              "scaling_efficiency": round(eff, 3)}))
    return results


if __name__ == "__main__":
    main()
