"""Remote-path (cross-slab gather) variants on the real chip.

The slab SpMM's remote side is gather-bound (~3.4 ms floor at 458K edges
x 7.4 ns/row); this isolates the overheads around the gather across
variants so the remote plan geometry is chosen on data:

  A. chunk kernel, W=C=1024 (current default)
  B. chunk kernel, W=C=512
  C. chunk kernel, W=C=2048
  D. XLA gather + weighted sorted segment_sum (no kernel, no padding slots)
  E. D but with bf16 messages and f32 accumulation via segment_sum

Salted fori-loop protocol (CLAUDE.md).  Run alone:
PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

import numpy as np

K = 10


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
    from sgformer_tpu.kernels.chunks import _build_plan
    from sgformer_tpu.kernels.slabs import reorder_for_slabs
    from sgformer_tpu.kernels.spmm import _apply_plan

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=8,
                           num_classes=40, seed=0)
    ei = to_undirected(np.asarray(ds.graph["edge_index"]))
    ei = add_self_loops(remove_self_loops(ei), N)
    perm, inv = reorder_for_slabs(ei, N, slab_rows=16384)
    src, dst = sort_by_dst(np.stack([inv[ei[0]], inv[ei[1]]]))
    weight = gcn_norm_weights(src, dst, N)

    # replicate the sliding-residency remote split (R=24576, H=4096, W=128)
    W, R, H = 128, 24576, 4096
    n_pad = -(-N // H) * H
    m = src != dst
    s, d, w = src[m], dst[m], weight[m]
    win = d // W
    n_windows = -(-n_pad // W)
    hist = np.zeros((n_windows, n_pad // H), dtype=np.int32)
    np.add.at(hist, (win, s // H), 1)
    sl = np.cumsum(hist, axis=1)
    sl = np.concatenate([np.zeros((n_windows, 1), sl.dtype), sl], axis=1)
    span = R // H
    cover = sl[:, span:] - sl[:, :-span]
    base = np.argmax(cover, axis=1).astype(np.int64)
    best = cover[np.arange(n_windows), base]
    for wi in range(1, n_windows):
        if cover[wi, base[wi - 1]] >= 0.98 * best[wi]:
            base[wi] = base[wi - 1]
    local = (s // H >= base[win]) & (s // H < base[win] + span)
    rs, rd, rw = s[~local], d[~local], w[~local]
    Er = len(rs)
    print(f"remote edges: {Er}", flush=True)

    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((n_pad, 256)), dtype=jnp.bfloat16)
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

    order = np.argsort(rd, kind="stable")
    rs_o, rd_o, rw_o = rs[order], rd[order], rw[order]

    for name, wc in (("A W=C=1024", 1024), ("B W=C=512", 512),
                     ("C W=C=2048", 2048)):
        plan = _build_plan(rs_o, rd_o, rw_o, n_pad, chunk_edges=wc,
                           window_rows=wc)
        nslots = plan.weight.size

        def loop(salt, xp, p):
            def body(i, carry):
                x_c, acc = carry
                out = _apply_plan(x_c, p, jnp.bfloat16, False)
                probe = jnp.sum(out) + salt
                return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
            return jax.lax.fori_loop(0, K, body, (xp, salt))[1]

        ms = timed(loop, xp, plan)
        print(f"{name}: {ms:6.2f} ms (fill {Er/nslots:.2f}, "
              f"{ms/Er*1e6:.1f} ns/edge, {plan.num_chunks} chunks)",
              flush=True)

    js = jnp.asarray(rs_o.astype(np.int32))
    jd = jnp.asarray(rd_o.astype(np.int32))
    jw = jnp.asarray(rw_o.astype(np.float32))

    def seg_loop_f32(salt, xp, js, jd, jw):
        def body(i, carry):
            x_c, acc = carry
            msgs = jnp.take(x_c.astype(jnp.float32), js, axis=0)
            msgs = msgs * jw[:, None]
            out = jax.ops.segment_sum(msgs, jd, num_segments=n_pad,
                                      indices_are_sorted=True)
            probe = jnp.sum(out) + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (xp, salt))[1]

    ms = timed(seg_loop_f32, xp, js, jd, jw)
    print(f"D gather+segsum f32 msgs: {ms:6.2f} ms ({ms/Er*1e6:.1f} ns/edge)",
          flush=True)

    def seg_loop_bf16(salt, xp, js, jd, jw):
        def body(i, carry):
            x_c, acc = carry
            msgs = jnp.take(x_c, js, axis=0) * jw[:, None].astype(
                jnp.bfloat16)
            out = jax.ops.segment_sum(msgs.astype(jnp.float32), jd,
                                      num_segments=n_pad,
                                      indices_are_sorted=True)
            probe = jnp.sum(out) + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (xp, salt))[1]

    ms = timed(seg_loop_bf16, xp, js, jd, jw)
    print(f"E gather+segsum bf16 msgs: {ms:6.2f} ms ({ms/Er*1e6:.1f} ns/edge)",
          flush=True)


if __name__ == "__main__":
    main()
