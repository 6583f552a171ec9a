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
* **Export hand-off** — ``export_artifact()`` serializes the forward as
  a ``jax.export`` StableHLO artifact with a flat array signature; a
  serving process restores and calls it without this package installed.

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
        self._jitted = None  # lazy jit for the un-compiled path

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
            # cache the jitted callable — a fresh jax.jit per call would
            # retrace the model on every request (round-4 review pattern)
            if self._jitted is None:
                self._jitted = jax.jit(self._fwd)
            fn = self._jitted
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

    def export_artifact(self, path: str, *,
                        include_inputs: bool = False) -> str:
        """Serialize the bound forward to a ``jax.export`` artifact.

        The artifact captures the traced computation (StableHLO) for the
        bound shapes/dtypes and the lowering platform — a serving process
        restores it with :func:`load_exported` and calls it WITHOUT the
        model code, flax, or this package being importable at all.  To
        make that literal, the exported function takes the FLAT leaf
        list of ``(params, batch_stats, x, graph)`` (plain arrays; the
        pytree structure is baked into the trace), so the serving side
        never needs the :class:`~sgformer_tpu.graph.Graph` class or a
        registered pytree.  With ``include_inputs=True`` the leaves are
        also written to ``path + ".inputs.npz"`` (ordered ``arr_0..``),
        making the pair a self-contained serving bundle.

        **Node order**: slab-mode graphs carry a clustering reorder, so
        the exported forward emits logits in the graph's internal node
        order, not the caller's.  The bundle therefore always includes a
        named ``inv_perm`` array in the ``.inputs.npz`` (identity when
        the graph has no reorder): apply ``out[inv_perm]`` to recover
        original node ids, exactly like :meth:`logits` does in-process.

        This is the deployment hand-off the reference has no equivalent
        of: its serving story ends at the eval block inside the training
        loop (``large/main.py:144-156``).

        Note the platform is baked in at export time (an artifact
        exported under TPU lowers TPU-targeted StableHLO; export on the
        deployment platform, or rely on jax.export's cross-platform
        lowering if configured).
        """
        from jax import export as jax_export

        args = (self.state["params"], self.state["batch_stats"], self.x,
                self.graph)
        leaves, treedef = jax.tree.flatten(args)

        def flat_fwd(*flat):
            return self._fwd(*jax.tree.unflatten(treedef, flat))

        exp = jax_export.export(jax.jit(flat_fwd))(*leaves)
        with open(path, "wb") as f:
            f.write(exp.serialize())
        if include_inputs:
            inv = (
                self._inv_perm
                if self._inv_perm is not None
                else np.arange(self.x.shape[0], dtype=np.int64)
            )
            np.savez(path + ".inputs.npz",
                     *[np.asarray(leaf) for leaf in leaves],
                     inv_perm=inv)
        return path

    def export_leaves(self) -> list:
        """The flat argument list an exported artifact is called with."""
        return jax.tree.leaves(
            (self.state["params"], self.state["batch_stats"], self.x,
             self.graph)
        )


def load_exported(path: str):
    """Deserialize a :meth:`Predictor.export_artifact` file.

    Returns the ``jax.export.Exported``; invoke via ``.call(*leaves)``
    with the flat array list (``Predictor.export_leaves()``, or the
    ``arr_0..`` arrays of the ``.inputs.npz`` bundle — shapes/dtypes are
    validated by jax.export).  Output rows are in the graph's
    (possibly slab-reordered) node order; apply the predictor's inverse
    permutation for original ids."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


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
