"""Decompose the 10M-soak sampled train batch (scripts/soak_sampled_10m.py)
into host sampling / feature gather / host->device transfer / device step.

The soak's end-to-end ms/batch includes this environment's relay tunnel
(~28 ms/dispatch + limited host->device bandwidth for the ~82 MB x
buffer); a colocated deployment pays PCIe/ICI instead.  This bench
separates the parts so BENCH.md and docs/PAPERS100M.md can report which
costs are the framework's and which are the tunnel's.

Run alone (ONE TPU process), AFTER soak_sampled_10m.py --build:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_sampled_step.py
"""

import os
import time

import numpy as np

DATA_DIR = os.environ.get("SOAK10M_DIR", "/tmp/sgformer_10m")
C = 64


def main():
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from sgformer_tpu.data.feature_store import FeatureStore
    from sgformer_tpu.data.prep import load_csr
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.optim import dual_weight_decay_adam
    from sgformer_tpu.train.sampled_trainer import (SampledTrainConfig,
                                                    SampledTrainer,
                                                    batch_graph)

    label = np.load(os.path.join(DATA_DIR, "labels.npy"))
    store = FeatureStore.from_npy(os.path.join(DATA_DIR, "feat.npy"))
    csr = load_csr(os.path.join(DATA_DIR, "csr"), in_ram=True)

    cfg = SGFormerConfig.papers100m(256, C, compute_dtype="bf16")
    tc = SampledTrainConfig(
        lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0,
        batch_size=1000, fanouts=(15, 10, 5), display_step=-1,
    )
    trainer = SampledTrainer(SGFormer(cfg), csr, store, label, tc)
    seeds_all = np.load(os.path.join(DATA_DIR, "train_idx.npy"))

    K = 16
    t0 = time.time()
    batches = [
        trainer.sampler.sample(seeds_all[i * 1000:(i + 1) * 1000])
        for i in range(K)
    ]
    samp_ms = (time.time() - t0) / K * 1e3
    print(f"1. host sampling:        {samp_ms:7.1f} ms/batch", flush=True)

    t0 = time.time()
    xs = [trainer.x[b.node_ids] for b in batches]
    gath_ms = (time.time() - t0) / K * 1e3
    mb = xs[0].nbytes / 1e6
    print(f"2. feature gather (f32): {gath_ms:7.1f} ms/batch "
          f"({mb:.0f} MB from memmap)", flush=True)

    # init once (jitted)
    warm = batches[0]
    g0 = batch_graph(warm)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, x, g, nm: trainer.model.init(
            {"params": r}, x, g, train=False, node_mask=nm)
    )(rng, jnp.asarray(xs[0]), g0, jnp.asarray(warm.node_mask))
    state = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
    tx = dual_weight_decay_adam(state["params"], 1e-3, 0.0, 0.0)
    opt_state = tx.init(state["params"])
    train_step, _ = trainer._steps(tx)

    # 3. transfer alone: device_put of fresh f32 x buffers, block on the
    # large array (relay-safe sync)
    devs = []
    t0 = time.time()
    for x in xs:
        d = jax.device_put(x)
        d.block_until_ready()
        devs.append(d)
    tx_ms = (time.time() - t0) / K * 1e3
    print(f"3. host->device transfer:{tx_ms:7.1f} ms/batch "
          f"({mb:.0f} MB f32 through this environment's tunnel)", flush=True)

    # bf16 variant: the model casts x to bf16 at entry anyway, so a bf16
    # transfer is numerically identical on the bf16 path and HALF the bytes
    xs16 = [x.astype(np.float16) for x in xs]  # proxy for 2-byte transfer
    t0 = time.time()
    for x in xs16:
        jax.device_put(x).block_until_ready()
    tx16_ms = (time.time() - t0) / K * 1e3
    print(f"   2-byte transfer:      {tx16_ms:7.1f} ms/batch "
          f"({mb/2:.0f} MB)", flush=True)

    # 4. device step on pre-staged inputs (fresh state threads through ->
    # no relay memoization); warm the compile first
    other = [
        (batch_graph(b), jnp.asarray(trainer.label[b.node_ids]),
         jnp.asarray(b.node_mask),
         jnp.asarray(float(b.num_seeds), jnp.float32))
        for b in batches
    ]
    rng, drop = jax.random.split(rng)
    state, opt_state, loss = train_step(
        state, opt_state, drop, devs[0], *[o for o in other[0]])
    _ = float(loss)
    t0 = time.time()
    for d, (g, lab, nm, ns) in zip(devs, other):
        rng, drop = jax.random.split(rng)
        state, opt_state, loss = train_step(
            state, opt_state, drop, d, g, lab, nm, ns)
    _ = float(loss)
    step_ms = (time.time() - t0) / K * 1e3
    print(f"4. device train step:    {step_ms:7.1f} ms/batch "
          f"(graph/label/mask dispatch incl.)", flush=True)
    print(f"   sum(1..4) ~= soak end-to-end; colocated estimate = "
          f"max(1,2 prefetched) + PCIe transfer + step", flush=True)


if __name__ == "__main__":
    main()
