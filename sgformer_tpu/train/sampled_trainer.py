"""Neighbor-sampled trainer — the papers100M path
(``/root/reference/100M/nb-sample.py:70-246``).

Reference semantics preserved:
- train/valid/test each get their own sampler over their split's seeds;
- the loss reads only the SEED rows of the output (seeds are the first
  ``graph.batch_size`` rows — the PER-BATCH count, so the epoch's
  remainder batch trains/evaluates its true seed tail exactly like the
  reference, ``nb-sample.py:27-35,174,181``);
- streaming correct/total eval over the valid/test loaders each epoch;
- best-on-valid model selection, optional checkpoint save, and a
  ``--use_pretrained`` finetune path that restores the saved params
  (``nb-sample.py:158-160``).

TPU-first: batches are padded to static caps so ONE jitted step serves the
epoch; the host sampler runs ahead of the device via PrefetchIterator.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sgformer_tpu.graph import Graph
from sgformer_tpu.sample.neighbor import NeighborSampler, PrefetchIterator
from sgformer_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from sgformer_tpu.train.logger import RunLogger
from sgformer_tpu.train.optim import dual_weight_decay_adam
from sgformer_tpu.train.trainer import TrainConfig


def batch_graph(batch) -> Graph:
    """Static-shape Graph view of a SampledBatch."""
    n = len(batch.node_mask)
    indptr = np.zeros(n + 1, dtype=np.int64)
    return Graph(
        edge_src=jnp.asarray(batch.edge_src),
        edge_dst=jnp.asarray(batch.edge_dst),
        gcn_weight=jnp.asarray(batch.edge_weight),
        indptr=jnp.asarray(indptr, dtype=jnp.int32),
        num_nodes=int(n),
        num_edges=int(len(batch.edge_src)),
    )


@dataclasses.dataclass(frozen=True)
class SampledTrainConfig(TrainConfig):
    batch_size: int = 1000
    fanouts: tuple = (15, 10, 5)
    node_cap: Optional[int] = None
    edge_cap: Optional[int] = None
    save_model: bool = False
    model_dir: str = "models/ckpt"
    use_pretrained: bool = False
    prefetch_depth: int = 2
    # sweep the TRAIN split each eval epoch?  The reference's 100M loop
    # never computes train accuracy (only valid/test sweeps,
    # nb-sample.py:176-191) — at papers100M scale a train sweep is ~10x
    # the valid+test work per epoch.  Off = record 0.0 for train.
    eval_train: bool = False
    # dtype of the per-batch feature buffer shipped host->device.
    # 'auto' = bf16 when the model's compute_dtype is bf16 (the model
    # casts x to bf16 at entry, sgformer.py:156-157, so a host-side cast
    # is numerically identical and HALVES the dominant transfer), else
    # f32.  'f32' forces full precision.
    transfer_dtype: str = "auto"
    # concurrent sampling threads (the C++ sampler releases the GIL —
    # PyG's num_workers equivalent, nb-sample.py:131).  Measured 2-4x on
    # a 4-core host at the 10M CSR (docs/PAPERS100M.md); matters when
    # the sampler, not the device, bounds the pipeline (papers100M
    # depth).  0 = sample in the single prefetch thread.
    sampler_workers: int = 0


class SampledTrainer:
    def __init__(
        self,
        model,
        edge_index: np.ndarray,
        x: np.ndarray,
        label: np.ndarray,
        config: SampledTrainConfig,
    ):
        self.model = model
        self.config = config
        # Leave FeatureStore/memmap-backed features un-materialized — the
        # per-batch row gather is the only access pattern.
        if hasattr(x, "__getitem__") and not isinstance(x, np.ndarray):
            self.x = x
        else:
            self.x = np.asarray(x, dtype=np.float32)
        self.label = np.asarray(label).reshape(-1).astype(np.int32)
        from sgformer_tpu.sample.neighbor import CSRGraph

        # edge_index may be a prebuilt CSRGraph (data/prep.py) — the
        # 10M+/papers100M path where the edge list never sits in RAM
        self.edge_index = (
            edge_index if isinstance(edge_index, CSRGraph)
            else np.asarray(edge_index)
        )
        self.num_nodes = self.x.shape[0]
        self.sampler = NeighborSampler(
            self.edge_index,
            self.num_nodes,
            fanouts=config.fanouts,
            batch_size=config.batch_size,
            node_cap=config.node_cap,
            edge_cap=config.edge_cap,
            seed=config.seed,
        )
        self._transfer_cast = None
        want = config.transfer_dtype
        if want == "auto":
            want = (
                "bf16"
                if getattr(getattr(model, "config", None), "compute_dtype",
                           "f32") == "bf16"
                else "f32"
            )
        if want == "bf16":
            import ml_dtypes

            self._transfer_cast = ml_dtypes.bfloat16

    def _gather_x(self, node_ids: np.ndarray) -> np.ndarray:
        """Per-batch feature rows, cast for transfer (run in the prefetch
        thread so gather+cast overlap device compute).  A bf16
        FeatureStore's rows pass through uncast on the bf16 path; the f32
        path always receives f32 (the exactness invariant)."""
        x = self.x[node_ids]
        want = (
            self._transfer_cast
            if self._transfer_cast is not None
            else np.float32
        )
        return x.astype(want, copy=False)

    def prepared_epoch(self, seeds: np.ndarray, *, shuffle: bool = True,
                       workers: Optional[int] = None):
        """Prefetched iterator of ``(batch, x_rows)``: sampling AND the
        feature gather+cast run ahead of the device (the soak's
        decomposition showed the gather is the largest host cost,
        scripts/microbench_sampled_step.py — leaving it in the consume
        loop serializes it with the step)."""

        if workers is None:
            workers = self.config.sampler_workers

        def produce():
            for batch in self.sampler.epoch(seeds, shuffle=shuffle,
                                            workers=workers):
                yield batch, self._gather_x(batch.node_ids)

        return PrefetchIterator(produce(), depth=self.config.prefetch_depth)

    def _steps(self, tx):
        cfg = self.config
        n_seed = cfg.batch_size

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(state, opt_state, rng, x_b, graph_b, label_b,
                       node_mask, num_seeds_b):
            def loss_fn(params, batch_stats):
                out, mut = self.model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x_b,
                    graph_b,
                    train=True,
                    node_mask=node_mask,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                # CrossEntropy on the seed rows only (nb-sample.py:30-33).
                # The reference reads the PER-BATCH seed count
                # (``graph.batch_size``, nb-sample.py:174): the epoch's
                # remainder batch has fewer than batch_size seeds, so the
                # static [:n_seed] slice is masked down to the true count
                # — rows past it are sampled NEIGHBORS, not padding, and
                # averaging them in would train on non-seed labels.  Full
                # batches reduce identically to a plain mean.
                logp = jax.nn.log_softmax(out[:n_seed])
                per = -jnp.take_along_axis(
                    logp, label_b[:n_seed, None], axis=1
                )[:, 0]
                m = (jnp.arange(n_seed) < num_seeds_b).astype(per.dtype)
                return jnp.sum(per * m) / num_seeds_b, mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"], state["batch_stats"]
            )
            updates, opt_state = tx.update(grads, opt_state, state["params"])
            params = optax.apply_updates(state["params"], updates)
            return {"params": params, "batch_stats": new_bs}, opt_state, loss

        @jax.jit
        def eval_step(state, x_b, graph_b, node_mask):
            out = self.model.apply(
                {"params": state["params"], "batch_stats": state["batch_stats"]},
                x_b,
                graph_b,
                train=False,
                node_mask=node_mask,
            )
            return jnp.argmax(out[:n_seed], axis=-1)

        return train_step, eval_step

    def _sweep(self, eval_step, state, seeds: np.ndarray):
        """Streaming accuracy over one split (nb-sample.py:38-45)."""
        total = correct = 0
        for batch, x_rows in self.prepared_epoch(seeds, shuffle=False):
            g = batch_graph(batch)
            pred = np.asarray(
                eval_step(
                    state,
                    jnp.asarray(x_rows),
                    g,
                    jnp.asarray(batch.node_mask),
                )
            )
            lab = self.label[batch.node_ids[: batch.num_seeds]]
            total += batch.num_seeds
            correct += int((pred[: batch.num_seeds] == lab).sum())
        return correct / max(total, 1)

    def fit(self, split_idx_lst, rng: Optional[jax.Array] = None):
        cfg = self.config
        logger = RunLogger(cfg.runs, mode=cfg.mode)
        if rng is None:
            from sgformer_tpu.utils.rng import train_key

            rng = train_key(cfg.seed, cfg.rng_impl)
        best_state = None

        for run in range(cfg.runs):
            split_idx = split_idx_lst[run % len(split_idx_lst)]
            train_seeds = np.asarray(split_idx["train"])
            rng, init_rng = jax.random.split(rng)
            warm = self.sampler.sample(train_seeds[: cfg.batch_size])
            g0 = batch_graph(warm)
            variables = jax.jit(
                lambda r, x, g, nm: self.model.init(
                    {"params": r}, x, g, train=False, node_mask=nm
                )
            )(init_rng, jnp.asarray(self._gather_x(warm.node_ids)), g0,
              jnp.asarray(warm.node_mask))
            params = variables["params"]
            if cfg.use_pretrained:
                restored = load_checkpoint(cfg.model_dir)
                params = jax.tree_util.tree_map(
                    jnp.asarray, restored["state"]["params"]
                )
            state = {
                "params": params,
                "batch_stats": variables.get("batch_stats", {}),
            }
            tx = dual_weight_decay_adam(
                params, cfg.lr, cfg.trans_weight_decay, cfg.gnn_weight_decay
            )
            opt_state = tx.init(params)
            train_step, eval_step = self._steps(tx)

            best_val = -1.0
            for epoch in range(cfg.epochs):
                loss = jnp.zeros(())
                for batch, x_rows in self.prepared_epoch(
                    train_seeds, shuffle=True
                ):
                    g = batch_graph(batch)
                    rng, drop = jax.random.split(rng)
                    state, opt_state, loss = train_step(
                        state,
                        opt_state,
                        drop,
                        jnp.asarray(x_rows),
                        g,
                        jnp.asarray(self.label[batch.node_ids]),
                        jnp.asarray(batch.node_mask),
                        jnp.asarray(float(batch.num_seeds), jnp.float32),
                    )
                splits = (
                    ("train", "valid", "test") if cfg.eval_train
                    else ("valid", "test")
                )
                accs = {
                    split: self._sweep(eval_step, state, np.asarray(split_idx[split]))
                    for split in splits
                }
                accs.setdefault("train", 0.0)
                logger.add_result(
                    run, (accs["train"], accs["valid"], accs["test"], 0.0)
                )
                if accs["valid"] > best_val:
                    best_val = accs["valid"]
                    best_state = jax.tree_util.tree_map(np.asarray, state)
                if cfg.display_step > 0 and epoch % cfg.display_step == 0:
                    print(
                        f"Epoch {epoch:02d} loss {float(loss):.4f} "
                        f"train {accs['train']:.4f} valid {accs['valid']:.4f} "
                        f"test {accs['test']:.4f}"
                    )
            if cfg.save_model and best_state is not None:
                save_checkpoint(cfg.model_dir, best_state, step=cfg.epochs)
            if cfg.display_step >= 0:
                logger.print_statistics(run)
        self.best_state = best_state
        return logger
