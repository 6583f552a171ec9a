"""Slab SpMM geometry sweep on the real chip, arxiv-shaped bench graph.

One shared clustering reorder; per-geometry plans; times the COMBINED
slab_spmm (local + remote + self) which is the decision metric, plus the
local/remote parts for each candidate.  Covers both metadata encodings:
in-kernel one-hot builds ("meta") and host-prebuilt streamed selectors
("ssel").  Salted fori-loop protocol (CLAUDE.md).
Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import gc
import time

import numpy as np

K = 10

# (name, W, B, C, Q, R, mp, stream_sel, remW, remC)
# Round-2b: local fill at C=32 is ~0.58 (median group ~40 edges pads to
# 64 slots) — smaller C at the same Q*C slots/step raises fill and cuts
# steps if the extra per-dot overhead doesn't eat it.
# Cost model fitted on the first fill sweep (real, dispatch-corrected):
#   t_local ≈ 0.55 µs/step + 11 ns/dot + 0.54 ns/slot  (stream-bound slot)
# so at fixed C the lever is bigger Q·C (fewer steps), VMEM allowing.
GEOMS = [
    ("ssel C16 Q128 R24K remW512 (shipped)", 128, 128, 16, 128, 24576, 8,
     "bf16", 512, 512),
    # round-2c: the (window, sub) group-size distribution is tight around
    # 41 edges (scripts/analyze_groups.py) so C=48 fits ~most groups in ONE
    # chunk: dots 134K -> 53K at fill 0.71.  This run decides between the
    # flat-11ns-per-dot model (predicts ~2.8 ms, a win) and the
    # sublane-tile model ceil(C/16)*11ns (predicts ~4.3 ms, a loss) —
    # the C24 wash hints at the latter.
    ("ssel C48 Q42 R24K remW512", 128, 128, 48, 42, 24576, 8, "bf16",
     512, 512),
]


def main():
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import (add_self_loops, gcn_norm_weights,
                                    remove_self_loops, sort_by_dst,
                                    to_undirected)
    from sgformer_tpu.kernels.slab_spmm import (_apply_local, slab_spmm)
    from sgformer_tpu.kernels.slabs import build_slabs, reorder_for_slabs
    from sgformer_tpu.kernels.spmm import _apply_plan

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=8,
                           num_classes=40, seed=0)
    ei = to_undirected(np.asarray(ds.graph["edge_index"]))
    ei = add_self_loops(remove_self_loops(ei), N)
    t0 = time.time()
    perm, inv = reorder_for_slabs(ei, N, slab_rows=16384)
    print(f"reorder: {time.time()-t0:.1f}s", flush=True)
    src, dst = sort_by_dst(np.stack([inv[ei[0]], inv[ei[1]]]))
    weight = gcn_norm_weights(src, dst, N)
    E = len(src)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, 256)), dtype=jnp.bfloat16)

    salt_counter = [0.0]

    def timed(f, *args):
        fj = jax.jit(f)

        def call():
            salt_counter[0] += 1.0
            return float(fj(jnp.float32(salt_counter[0]), *args))

        call()
        t0 = time.perf_counter()
        call()
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        call()
        dt2 = time.perf_counter() - t0
        return min(dt1, dt2) / K * 1e3

    def slab_loop(salt, x, p):
        def body(i, carry):
            x_c, acc = carry
            out = slab_spmm(x_c, p, compute_dtype=jnp.bfloat16)
            probe = jnp.sum(out.astype(jnp.float32)) + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (x, salt))[1]

    for name, W, B, C, Q, R, mp, ssel, remW, remC in GEOMS:
        t0 = time.time()
        plan = build_slabs(
            src, dst, weight, N, window_rows=W, block_rows=B,
            chunk_edges=C, chunks_per_step=Q, slab_rows=R, min_pair=mp,
            stream_sel=ssel, remote_window_rows=remW,
            remote_chunk_edges=remC,
        )
        tb = time.time() - t0
        nrem = (0 if plan.fwd.remote is None
                else int(np.sum(np.asarray(plan.fwd.remote.weight) != 0)))
        try:
            ms = timed(slab_loop, x, plan)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            del plan
            gc.collect()
            continue
        print(f"{name}: {ms:7.2f} ms ({E/ms/1e3:6.1f} Medges/s) "
              f"steps={plan.fwd.n_steps} remote={nrem/E:.3f} "
              f"build={tb:.0f}s", flush=True)

        # parts breakdown — the plan MUST be a jit ARGUMENT (a closure
        # would inline 100s of MB of selector constants into the HLO and
        # blow the remote-compile relay's request size limit)
        xp = jnp.pad(x, ((0, plan.n_pad - x.shape[0]), (0, 0)))

        def local_loop(salt, xp, side):
            prev0 = jnp.zeros((side.num_rows_out, xp.shape[1]),
                              jnp.float32)

            def body(i, carry):
                x_c, acc = carry
                out = _apply_local(x_c, prev0, side, jnp.bfloat16, False)
                probe = jnp.sum(out) + salt
                return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
            return jax.lax.fori_loop(0, K, body, (xp, salt))[1]

        ms_l = timed(local_loop, xp, plan.fwd)
        n_self = int(np.sum(src == dst))
        n_local = E - nrem - n_self
        fill_l = n_local / (plan.fwd.n_steps * Q * C)
        print(f"  local: {ms_l:6.2f} ms ({plan.fwd.n_steps} steps, "
              f"{ms_l/plan.fwd.n_steps*1e3:.2f} us/step, fill {fill_l:.2f})",
              flush=True)

        if plan.fwd.remote is not None:
            def remote_loop(salt, xp, rem):
                def body(i, carry):
                    x_c, acc = carry
                    out = _apply_plan(x_c, rem, jnp.bfloat16, False)
                    probe = jnp.sum(out) + salt
                    return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
                return jax.lax.fori_loop(0, K, body, (xp, salt))[1]

            nslots = plan.fwd.remote.weight.size
            ms_r = timed(remote_loop, xp, plan.fwd.remote)
            print(f"  remote: {ms_r:6.2f} ms ({nrem} edges, "
                  f"fill {nrem/nslots:.2f}, {ms_r/nrem*1e6:.1f} ns/edge)",
                  flush=True)
        del plan
        gc.collect()


if __name__ == "__main__":
    main()
