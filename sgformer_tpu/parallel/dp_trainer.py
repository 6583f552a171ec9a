"""DPBatchTrainer — ``main-batch.py`` semantics on a (dp, sp) mesh.

Where the reference (and :class:`~sgformer_tpu.train.batch_trainer.
BatchTrainer`) processes random-partition batches sequentially, this
trainer runs ``dp`` of them CONCURRENTLY per step, each node-sharded over
``sp`` (see :mod:`sgformer_tpu.parallel.dp_batch` for the step's collective
structure and its equality tests).  Epoch wall-time divides by dp at equal
per-device batch work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgformer_tpu.data.metrics import METRICS
from sgformer_tpu.parallel.dp_batch import (
    build_dp_sp_batch,
    make_dp_sp_train_step,
)
from sgformer_tpu.parallel.mesh import make_mesh
from sgformer_tpu.train.batch_trainer import BatchTrainConfig, edge_bucket
from sgformer_tpu.train.logger import RunLogger
from sgformer_tpu.train.optim import dual_weight_decay_adam


class DPBatchTrainer:
    def __init__(
        self,
        model,
        edge_index: np.ndarray,
        x: np.ndarray,
        label: np.ndarray,
        config: BatchTrainConfig,
        mesh=None,
        dp: int = 2,
        sp: Optional[int] = None,
        eval_func=None,
    ):
        if mesh is None:
            n_dev = len(jax.devices())
            sp = sp or n_dev // dp
            mesh = make_mesh((dp, sp), ("dp", "sp"))
        self.mesh = mesh
        self.dp = int(mesh.shape["dp"])
        self.sp = int(mesh.shape["sp"])
        self.model = model
        self.edge_index = np.asarray(edge_index)
        self.x = np.asarray(x, dtype=np.float32)
        self.label_np = np.asarray(label)
        self.label_flat = self.label_np.reshape(-1).astype(np.int32)
        self.config = config
        self.eval_func = eval_func or METRICS[config.metric]
        self.num_nodes = self.x.shape[0]
        self.final_state = None

    def fit(self, split_idx_lst, rng: Optional[jax.Array] = None):
        cfg = self.config
        logger = RunLogger(cfg.runs, mode=cfg.mode)
        if rng is None:
            from sgformer_tpu.utils.rng import train_key

            rng = train_key(cfg.seed, cfg.rng_impl)
        np_rng = np.random.default_rng(cfg.seed)
        B = cfg.batch_size
        groups_per_step = self.dp
        # the epoch covers ALL nodes (the reference trains its remainder
        # batch, main-batch.py:129): the final step carries the leftover
        # < B*dp nodes split as evenly as possible across groups, padded
        # to the full compiled shape and masked
        full_steps = self.num_nodes // (B * groups_per_step)
        remainder = self.num_nodes - full_steps * B * groups_per_step
        num_steps = full_steps + (remainder > 0)
        exp_edges = int(
            self.edge_index.shape[1] * (B / self.num_nodes) ** 2 / self.sp + B
        )
        edge_cap = edge_bucket(int(exp_edges * 2.5) + cfg.ladder_base,
                               cfg.ladder_base)

        from jax.sharding import PartitionSpec as P

        for run in range(cfg.runs):
            split_idx = split_idx_lst[run % len(split_idx_lst)]
            train_set = np.zeros(self.num_nodes, dtype=bool)
            train_set[np.asarray(split_idx["train"])] = True

            # init on a warm dp-batch under shard_map; when the dataset is
            # smaller than B*dp the warm groups are short (padded+masked
            # like the epoch's remainder step)
            avail = np.arange(min(self.num_nodes, B * self.dp))
            szs = [
                len(avail) // self.dp + (g < len(avail) % self.dp)
                for g in range(self.dp)
            ]
            off = np.concatenate([[0], np.cumsum(szs)])
            warm = [avail[off[g]:off[g + 1]][:B] for g in range(self.dp)]
            graph, idx, nmask = build_dp_sp_batch(
                self.edge_index, warm, self.num_nodes, sp=self.sp,
                edge_cap=edge_cap, pad_nodes_to=B,
            )
            rng, init_rng = jax.random.split(rng)
            variables = jax.jit(jax.shard_map(
                lambda r, xx, g, nm: self.model.init(
                    {"params": r}, xx.reshape(xx.shape[-2:]), g.local(),
                    train=False, node_mask=nm.reshape(-1)),
                mesh=self.mesh,
                in_specs=(P(), P("dp", "sp", None), P("dp", "sp"),
                          P("dp", "sp")),
                out_specs=P(), check_vma=False,
            ))(init_rng, jnp.asarray(self.x[idx]), graph, jnp.asarray(nmask))
            params = variables["params"]
            bs = variables.get("batch_stats", {})
            tx = dual_weight_decay_adam(
                params, cfg.lr, cfg.trans_weight_decay, cfg.gnn_weight_decay
            )
            opt_state = tx.init(params)
            step = make_dp_sp_train_step(self.model, tx, self.mesh,
                                         loss=cfg.loss)
            eval_fn = self._make_eval(edge_cap)

            for epoch in range(cfg.epochs):
                perm = np_rng.permutation(self.num_nodes)
                for i in range(num_steps):
                    base = i * B * self.dp
                    if i < full_steps:
                        batches = [
                            perm[base + g * B: base + (g + 1) * B]
                            for g in range(self.dp)
                        ]
                    else:
                        r = perm[base:]
                        szs = [
                            len(r) // self.dp + (g < len(r) % self.dp)
                            for g in range(self.dp)
                        ]
                        off = np.concatenate([[0], np.cumsum(szs)])
                        batches = [r[off[g]:off[g + 1]]
                                   for g in range(self.dp)]
                    graph, idx, nmask = build_dp_sp_batch(
                        self.edge_index, batches, self.num_nodes,
                        sp=self.sp, edge_cap=edge_cap, pad_nodes_to=B,
                    )
                    rng, drop = jax.random.split(rng)
                    params, bs, opt_state, loss = step(
                        params, bs, opt_state, drop,
                        jnp.asarray(self.x[idx]), graph,
                        jnp.asarray(self.label_flat[idx]),
                        jnp.asarray(nmask * train_set[idx]),
                        jnp.asarray(nmask),
                    )
                if epoch % cfg.eval_step == 0:
                    accs = eval_fn(params, bs, split_idx)
                    result = (accs["train"], accs["valid"], accs["test"], 0.0)
                    logger.add_result(run, result)
                    if cfg.display_step > 0 and epoch % cfg.display_step == 0:
                        print(
                            f"Epoch {epoch:02d} loss {float(loss):.4f} "
                            f"test {accs['test']:.4f}"
                        )
            if cfg.display_step >= 0:
                logger.print_statistics(run)
            self.final_state = {"params": params, "batch_stats": bs}
        return logger

    def _make_eval(self, edge_cap):
        """Streaming eval: dp groups each evaluate their own batch slice."""
        from sgformer_tpu.train.batch_trainer import (_pad_rows,
                                                      build_subgraph_batch)

        cfg = self.config

        # single-device eval on unsharded subgraphs (model must accept
        # axis_name-free execution: rebuild an unsharded twin via config)
        import dataclasses as _dc

        model_eval = self.model
        if hasattr(self.model, "config") and getattr(
            self.model.config, "axis_name", None
        ):
            model_eval = type(self.model)(
                _dc.replace(self.model.config, axis_name=None)
            )

        @jax.jit
        def fwd1(params, bs, x, graph, node_mask):
            return model_eval.apply(
                {"params": params, "batch_stats": bs}, x, graph, train=False,
                node_mask=node_mask,
            )

        def run(params, bs, split_idx):
            res = {}
            B = cfg.batch_size
            for split in ("train", "valid", "test"):
                sidx = np.asarray(split_idx[split])
                total = correct = 0
                for i in range(0, len(sidx), B):
                    bidx = sidx[i: i + B]
                    k = len(bidx)
                    # tail batch: pad to the compiled shape, mask out the
                    # pad rows — every split node is scored (a split
                    # smaller than B used to evaluate to 0.0)
                    gb = build_subgraph_batch(
                        self.edge_index, bidx, self.num_nodes,
                        bucket=edge_cap * self.sp,
                        pad_nodes_to=B if k < B else None,
                    )
                    xb = _pad_rows(self.x[bidx], B)
                    nm = np.zeros(B, dtype=np.float32)
                    nm[:k] = 1.0
                    out = np.asarray(
                        fwd1(params, bs, jnp.asarray(xb), gb,
                             jnp.asarray(nm))
                    )[:k]
                    pred = out.argmax(-1)
                    total += k
                    correct += int((pred == self.label_flat[bidx]).sum())
                res[split] = correct / max(total, 1)
            return res

        return run
