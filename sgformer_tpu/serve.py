"""Inference/serving path: ahead-of-time-compiled, donated, fixed-shape.

The reference's deployment story stops at an eval block inside the
training loop (``/root/reference/large/main.py:144-156``); production
serving on TPU wants more:

* **AOT compilation** — ``Predictor.compile()`` lowers and compiles the
  forward once at load time (``jax.jit(...).lower(...).compile()``), so
  the first request never pays tracing/compilation.
* **Original-id outputs** — slab-mode graphs carry a clustering reorder;
  the predictor maps logits back to the caller's node ids.
* **bf16 compute, f32 logits** — the production fast path (validated by
  the accuracy soak, scripts/accuracy_soak.py) with full-precision
  outputs.
* **Checkpoint loading** — restores the orbax layout written by
  :func:`sgformer_tpu.train.checkpoint.save_checkpoint` (params +
  batch_stats; optimizer state is ignored for serving).

Full-graph transductive serving: one compiled program answers any subset
of nodes (logits for all N are produced in ~one forward; slice on the
host).  For unseen-graph inductive serving, rebuild the ``Graph`` with
``preprocess_graph`` and construct a new Predictor — plans are host-side
metadata, compile cache keys on shapes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


class Predictor:
    """Compiled full-graph inference on a trained model.

    Args:
      model: flax module with ``__call__(x, graph, train=False)``.
      graph: preprocessed :class:`sgformer_tpu.graph.Graph` (any spmm
        mode; slab modes' node reorder is handled transparently).
      x: [N, F] node features in the ORIGINAL node order.
      state: ``{"params": ..., "batch_stats": ...}`` as produced by the
        trainers / restored from a checkpoint.
    """

    def __init__(self, model, graph, x, state: dict,
                 model_kwargs: Optional[dict] = None):
        self.model = model
        self.graph = graph
        self.model_kwargs = model_kwargs or {}
        x = np.asarray(x)
        perm = getattr(graph, "node_perm", None)
        if perm is not None:
            perm = np.asarray(perm)
            x = x[perm]
            self._inv_perm = np.empty(len(perm), dtype=np.int64)
            self._inv_perm[perm] = np.arange(len(perm))
        else:
            self._inv_perm = None
        import jax.numpy as jnp

        self.x = jnp.asarray(x)
        self.state = state
        self._compiled = None

        def fwd(params, batch_stats, xx, graph):
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, xx, graph,
                train=False, **self.model_kwargs,
            )
            return out[0] if isinstance(out, tuple) else out

        self._fwd = fwd

    def compile(self) -> "Predictor":
        """AOT-lower and compile the forward for the bound shapes: after
        this, no request ever traces or compiles.  Returns self."""
        lowered = jax.jit(self._fwd).lower(
            self.state["params"], self.state["batch_stats"], self.x,
            self.graph,
        )
        self._compiled = lowered.compile()
        return self

    def logits(self) -> np.ndarray:
        """[N, C] float32 logits in the ORIGINAL node order."""
        fn = self._compiled
        if fn is None:
            fn = jax.jit(self._fwd)
        out = np.asarray(
            fn(self.state["params"], self.state["batch_stats"], self.x,
               self.graph)
        )
        if self._inv_perm is not None:
            out = out[self._inv_perm]
        return out

    def predict(self, node_idx: Optional[np.ndarray] = None) -> np.ndarray:
        """argmax class per node (all nodes, or ``node_idx``)."""
        out = self.logits()
        if node_idx is not None:
            out = out[np.asarray(node_idx)]
        return out.argmax(axis=-1)

    def predict_proba(self, node_idx: Optional[np.ndarray] = None) -> np.ndarray:
        """softmax probabilities per node."""
        out = self.logits()
        if node_idx is not None:
            out = out[np.asarray(node_idx)]
        z = out - out.max(axis=-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=-1, keepdims=True)


def load_predictor(ckpt_path: str, model, graph, x,
                   model_kwargs: Optional[dict] = None,
                   template: Optional[Any] = None) -> Predictor:
    """Restore a trained checkpoint and return a compiled Predictor.

    ``template`` (optional): a ``{"state": ..., "step": ...}`` pytree of
    matching structure (e.g. from a fresh ``trainer.init_state``) for
    dtype/sharding-faithful restoration."""
    from sgformer_tpu.train.checkpoint import load_checkpoint

    payload = load_checkpoint(ckpt_path, template)
    state = payload["state"]
    return Predictor(model, graph, x, state,
                     model_kwargs=model_kwargs).compile()
