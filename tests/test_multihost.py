"""Multi-host bring-up: a REAL 2-process jax.distributed CPU cluster
(subprocesses, coordinator on localhost) exercising init_distributed,
make_global_mesh, per-process array feeding and a cross-process psum —
the DCN bring-up path of docs/MULTIHOST.md (SURVEY.md §2.5 mandate)."""

import socket
import subprocess
import sys
import textwrap

import numpy as np

WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    port, pid = sys.argv[1], int(sys.argv[2])
    from sgformer_tpu.parallel.mesh import (
        feed_process_local, init_distributed, make_global_mesh,
    )
    init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == 2 * n_local

    mesh = make_global_mesh()  # (dp=processes) x (sp=local devices)
    assert mesh.shape["dp"] == 2
    assert mesh.shape["sp"] == n_local

    # Global [8, 4] array fed per-process: this host owns rows
    # [pid*4, pid*4+4), sharded over dp (replicated over sp).
    rows = np.arange(4 * 4, dtype=np.float32).reshape(4, 4) + 100 * pid
    arr = feed_process_local(8, rows, mesh, "dp")
    assert arr.shape == (8, 4)

    # cross-process collective: global sum over the dp (DCN) axis
    from jax.sharding import PartitionSpec as P
    total = jax.jit(
        jax.shard_map(
            lambda a: jax.lax.psum(a.sum(), "dp"),
            mesh=mesh, in_specs=(P("dp", None),), out_specs=P(),
            check_vma=False,
        )
    )(arr)
    base = np.arange(16, dtype=np.float32)
    want = base.sum() + (base + 100).sum()
    assert abs(float(total) - float(want)) < 1e-3, (float(total), want)
    print(f"proc {pid} OK", flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
