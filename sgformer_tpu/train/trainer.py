"""Full-graph trainer: the TPU-native equivalent of ``large/main.py:107-156``
and ``medium/main.py:126-201``.

Everything per-step is ONE jit-compiled function (forward both branches,
loss on the train indices, backward, Adam update, BN stat update) — the
host only ever sees scalar losses and the periodic eval metrics.  Graph
structure, degree norms, and split indices are device-resident and
static-shape for the entire run, so XLA compiles exactly one train step and
one eval step per run.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict, freeze

from sgformer_tpu.data.metrics import METRICS
from sgformer_tpu.graph import Graph
from sgformer_tpu.train.logger import RunLogger
from sgformer_tpu.train.optim import dual_weight_decay_adam


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 0.01
    trans_weight_decay: float = 1e-3
    gnn_weight_decay: float = 1e-3
    epochs: int = 100
    eval_step: int = 1
    patience: int = 0  # early-stop on valid metric (medium/main.py:185-191); 0=off
    metric: str = "acc"
    mode: str = "max_acc"
    loss: str = "nll"  # 'nll' (log_softmax+NLL) | 'bce' (BCEWithLogits)
    runs: int = 1
    seed: int = 123
    display_step: int = -1  # print every k epochs; -1 = silent
    # NodeFormer edge-regularization weight: models returning
    # (logits, link_losses) get `loss -= lamda * mean(link_losses)`
    # (medium/main.py:153-174)
    lamda: float = 1.0
    # PRNG bit generator for init/dropout streams: 'auto' = hardware rbg
    # on TPU (utils/rng.py; ~30% faster train step), threefry elsewhere
    rng_impl: str = "auto"


def cross_entropy_loss(logits, labels, idx):
    """log_softmax + NLL on the selected nodes (large/main.py:139-141).

    Computed as a masked full-N reduction rather than ``logits[idx]``:
    the row gather (and its backward scatter) is row-rate-bound on TPU
    (~7.4 ns/row) and measured 2.5 ms of the arxiv-shaped train step,
    while the mask build + full-N elementwise fuse into the surrounding
    chains (scripts/microbench_nonspmm2.py).  Same value: sum over the
    selected nodes divided by their count."""
    mask = jnp.zeros((logits.shape[0],), jnp.float32).at[idx].set(1.0)
    logp = jax.nn.log_softmax(logits)
    onehot = jax.nn.one_hot(labels, logits.shape[1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=1)
    return jnp.sum(nll * mask) / idx.shape[0]


def bce_loss(logits, labels_onehot, idx):
    """BCEWithLogitsLoss on the selected nodes (large/main.py:134-137);
    masked full-N form for the same reason as ``cross_entropy_loss``."""
    mask = jnp.zeros((logits.shape[0],), jnp.float32).at[idx].set(1.0)
    lab = labels_onehot.astype(logits.dtype)
    per = optax.sigmoid_binary_cross_entropy(logits, lab).mean(axis=-1)
    return jnp.sum(per * mask) / idx.shape[0]


class Trainer:
    """Orchestrates N runs of (reset params → epoch loop → eval/selection).

    Args:
      model: a flax module whose ``__call__(x, graph, train=...)`` returns
        [N, C] logits (SGFormer or any baseline in the zoo).
      graph: preprocessed device-resident :class:`Graph`.
      x: [N, F] float node features.
      label: [N, 1] int labels (or [N, C] multilabel for bce).
    """

    def __init__(
        self,
        model,
        graph: Graph,
        x: np.ndarray,
        label: np.ndarray,
        config: TrainConfig,
        eval_func: Optional[Callable] = None,
        model_kwargs: Optional[dict] = None,
    ):
        self.model = model
        self.model_kwargs = model_kwargs or {}
        self.graph = graph
        self.config = config
        self.eval_func = eval_func or METRICS[config.metric]
        label = np.asarray(label)
        # Slab-mode graphs carry a clustering reorder (graph.node_perm):
        # permute node-indexed data into the new order once, and map every
        # split index through the inverse.  Metrics/logits stay consistent
        # because labels and indices move together.
        perm = getattr(graph, "node_perm", None)
        if perm is not None:
            perm = np.asarray(perm)
            x = np.asarray(x)[perm]
            label = label[perm]
            self._inv_perm = np.empty(len(perm), dtype=np.int64)
            self._inv_perm[perm] = np.arange(len(perm))
        else:
            self._inv_perm = None
        self.x = jnp.asarray(x)
        self.label_np = label
        if config.loss == "bce" and label.shape[1] == 1:
            n_cls = int(label.max()) + 1
            self.label_onehot = jnp.asarray(np.eye(n_cls)[label.reshape(-1)])
        elif config.loss == "bce":
            self.label_onehot = jnp.asarray(label)
        self.label = jnp.asarray(label.reshape(-1).astype(np.int32))
        self._train_step = None
        self._eval_step = None
        self._multi_steps = {}  # k -> fused k-step fn (_build_multi_step)
        self._fused_steps = True  # set False to force the per-epoch loop
        self._tx = None

    # -- state -------------------------------------------------------------

    def init_state(self, rng):
        # jit the init: un-jitted flax init evaluates eagerly op-by-op,
        # which is pathological over a high-latency device transport
        variables = jax.jit(
            lambda r, x, g: self.model.init(
                {"params": r}, x, g, train=False, **self.model_kwargs
            )
        )(rng, self.x, self.graph)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", freeze({}))
        tx = dual_weight_decay_adam(
            params,
            self.config.lr,
            self.config.trans_weight_decay,
            self.config.gnn_weight_decay,
        )
        opt_state = tx.init(params)
        return {"params": params, "batch_stats": batch_stats}, tx, opt_state

    # -- jitted steps --------------------------------------------------------

    def _make_loss_fn(self):
        cfg = self.config

        # x and graph are jit ARGUMENTS, not closures: closure constants are
        # inlined into the serialized HLO, which at ssel-plan scale (GBs of
        # streamed selectors) overflows the remote-compile relay — and on any
        # backend bloats the compile payload (the jitted init at
        # ``init_state`` passes them as args for the same reason).
        def loss_fn(params, batch_stats, dropout_rng, train_idx, x, graph):
            variables = {"params": params, "batch_stats": batch_stats}
            d_rng, p_rng = jax.random.split(dropout_rng)
            out, mutated = self.model.apply(
                variables,
                x,
                graph,
                train=True,
                rngs={"dropout": d_rng, "performer": p_rng},
                mutable=["batch_stats"],
                **self.model_kwargs,
            )
            link_losses = None
            if isinstance(out, tuple):
                out, link_losses = out
            if cfg.loss == "bce":
                loss = bce_loss(out, self.label_onehot, train_idx)
            else:
                loss = cross_entropy_loss(out, self.label, train_idx)
            if link_losses:
                loss = loss - cfg.lamda * sum(link_losses) / len(link_losses)
            return loss, mutated["batch_stats"]

        return loss_fn

    def _build_steps(self, tx):
        loss_fn = self._make_loss_fn()

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step_inner(state, opt_state, dropout_rng, train_idx, x,
                             graph):
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"], state["batch_stats"], dropout_rng, train_idx,
                x, graph,
            )
            updates, opt_state = tx.update(grads, opt_state, state["params"])
            params = optax.apply_updates(state["params"], updates)
            return {"params": params, "batch_stats": new_bs}, opt_state, loss

        @jax.jit
        def eval_step_inner(state, x, graph):
            variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
            out = self.model.apply(
                variables, x, graph, train=False, **self.model_kwargs
            )
            return out[0] if isinstance(out, tuple) else out

        def train_step(state, opt_state, dropout_rng, train_idx):
            return train_step_inner(state, opt_state, dropout_rng, train_idx,
                                    self.x, self.graph)

        def eval_step(state):
            return eval_step_inner(state, self.x, self.graph)

        return train_step, eval_step

    def _build_multi_step(self, tx, k: int):
        """``k`` train steps fused into ONE dispatch (``lax.scan``).

        The host round-trip per dispatch is pure overhead for full-graph
        training (the reference pays it per epoch, ``large/main.py:126-143``;
        over this environment's relay it is ~2.8 ms/dispatch) — between
        evals the whole epoch block can run device-side.  The dropout-key
        chain reproduces the per-epoch loop exactly (``rng, drop =
        split(rng)`` per step), so a fused block matches ``k`` single
        steps up to XLA reduction-order (~1 ulp on the loss; tested);
        returns ``(state, opt_state, rng_out, losses[k])``.
        """
        loss_fn = self._make_loss_fn()

        @partial(jax.jit, donate_argnums=(0, 1))
        def multi_step_inner(state, opt_state, rng, train_idx, x, graph):
            def chain(r, _):
                r, d = jax.random.split(r)
                return r, d

            rng_out, drops = jax.lax.scan(chain, rng, None, length=k)

            def body(carry, drop_rng):
                state, opt_state = carry
                (loss, new_bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state["params"], state["batch_stats"], drop_rng, train_idx,
                  x, graph)
                # BN-less models: init_state's empty batch_stats is a
                # FrozenDict but apply's mutated copy is a plain dict —
                # the scan carry needs one pytree structure
                if isinstance(state["batch_stats"], FrozenDict) and not (
                    isinstance(new_bs, FrozenDict)
                ):
                    new_bs = freeze(new_bs)
                updates, opt_state = tx.update(grads, opt_state,
                                               state["params"])
                params = optax.apply_updates(state["params"], updates)
                return ({"params": params, "batch_stats": new_bs},
                        opt_state), loss

            (state, opt_state), losses = jax.lax.scan(
                body, (state, opt_state), drops
            )
            return state, opt_state, rng_out, losses

        def multi_step(state, opt_state, rng, train_idx):
            return multi_step_inner(state, opt_state, rng, train_idx,
                                    self.x, self.graph)

        return multi_step

    # -- evaluation ----------------------------------------------------------

    def _map_idx(self, idx):
        """Original-id split indices -> the graph's (possibly reordered)
        node space."""
        idx = np.asarray(idx)
        return idx if self._inv_perm is None else self._inv_perm[idx]

    def evaluate(self, out: np.ndarray, split_idx: dict) -> tuple:
        """Host-side metric computation mirroring ``large/eval.py:7-33``."""
        res = []
        for split in ("train", "valid", "test"):
            idx = self._map_idx(split_idx[split])
            res.append(self.eval_func(self.label_np[idx], out[idx]))
        # valid loss
        vidx = self._map_idx(split_idx["valid"])
        logits = out[vidx]
        if self.config.loss == "bce":
            lab = np.asarray(self.label_onehot)[vidx]
            z = np.clip(logits, -30, 30)
            vloss = float(
                np.mean(np.maximum(z, 0) - z * lab + np.log1p(np.exp(-np.abs(z))))
            )
        else:
            logp = logits - _logsumexp(logits)
            vloss = float(-logp[np.arange(len(vidx)), self.label_np[vidx].reshape(-1)].mean())
        res.append(vloss)
        return tuple(res)

    def _prepare_train_idx(self, split_idx):
        """What the jitted train step receives for the train split; the
        sharded trainer overrides this to a padded node mask."""
        return jnp.asarray(
            self._map_idx(split_idx["train"]).astype(np.int32)
        )

    # -- main loop -----------------------------------------------------------

    def fit(self, split_idx_lst: list[dict], rng: Optional[jax.Array] = None):
        """Run ``config.runs`` training runs; returns the RunLogger."""
        cfg = self.config
        logger = RunLogger(cfg.runs, mode=cfg.mode)
        if rng is None:
            from sgformer_tpu.utils.rng import train_key

            rng = train_key(cfg.seed, cfg.rng_impl)

        for run in range(cfg.runs):
            split_idx = split_idx_lst[run % len(split_idx_lst)]
            train_idx = self._prepare_train_idx(split_idx)
            rng, init_rng = jax.random.split(rng)
            state, tx, opt_state = self.init_state(init_rng)
            if self._train_step is None:
                self._train_step, self._eval_step = self._build_steps(tx)
                self._tx = tx
            best_val = float("-inf")
            patience_ctr = 0

            # Between evals, epochs run as ONE fused device-side block
            # (same trajectory as the per-epoch loop up to reduction order,
            # see _build_multi_step); subclasses that override the step
            # builder keep the plain loop unless they provide their own
            # fused builder (ShardedTrainer does).
            use_fused = (
                cfg.eval_step > 1
                and self._fused_steps
                and (
                    type(self)._build_steps is Trainer._build_steps
                    or type(self)._build_multi_step
                    is not Trainer._build_multi_step
                )
            )
            epoch = 0
            while epoch < cfg.epochs:
                k = 1
                if use_fused and epoch % cfg.eval_step != 0:
                    next_eval = -(-epoch // cfg.eval_step) * cfg.eval_step
                    k = min(next_eval, cfg.epochs - 1) - epoch + 1
                if k > 1:
                    fn = self._multi_steps.get(k)
                    if fn is None:
                        fn = self._multi_steps[k] = self._build_multi_step(
                            self._tx, k
                        )
                    state, opt_state, rng, losses = fn(
                        state, opt_state, rng, train_idx
                    )
                    loss = losses[-1]
                else:
                    rng, drop_rng = jax.random.split(rng)
                    state, opt_state, loss = self._train_step(
                        state, opt_state, drop_rng, train_idx
                    )
                epoch += k
                if (epoch - 1) % cfg.eval_step == 0:
                    out = np.asarray(self._eval_step(state))
                    result = self.evaluate(out, split_idx)
                    logger.add_result(run, result)
                    if (cfg.display_step > 0
                            and (epoch - 1) % cfg.display_step == 0):
                        print(
                            f"Epoch: {epoch - 1:02d}, "
                            f"Loss: {float(loss):.4f}, "
                            f"Train: {100 * result[0]:.2f}%, "
                            f"Valid: {100 * result[1]:.2f}%, "
                            f"Test: {100 * result[2]:.2f}%"
                        )
                    if cfg.patience > 0:
                        if result[1] > best_val:
                            best_val = result[1]
                            patience_ctr = 0
                        else:
                            patience_ctr += 1
                            if patience_ctr >= cfg.patience:
                                break
            if cfg.display_step >= 0:
                logger.print_statistics(run)
            # final model state of the last run, for post-hoc analysis
            # (attention-map dumps, checkpointing from the CLI)
            self.final_state = state
        return logger


def _logsumexp(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))
