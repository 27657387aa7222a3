"""Multi-host data path: 2-process jax.distributed run on the CPU backend.

Validates SURVEY.md §2.2's DCN row end-to-end without a cluster: two OS
processes, each with 2 virtual CPU devices, form one 4-device mesh via
core.mesh.init_distributed; each process feeds only its process-local half of
the global batch (Loader process sharding + shard_batch's
make_array_from_process_local_data) and a jitted global-batch reduction sees
all samples exactly once.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]

    from hrviton_tpu.core.mesh import (init_distributed, local_batch_size,
                                       make_mesh, shard_batch)
    init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from hrviton_tpu.data.loader import Loader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.full((2, 3), float(i), np.float32)}

    assert jax.process_count() == 2
    assert jax.local_device_count() == 2
    assert jax.device_count() == 4
    mesh = make_mesh()

    loader = Loader(DS(), 4, shuffle=False, num_workers=1,
                    process_id=pid, num_processes=2)
    local = loader.next_batch()
    # process 0 holds global samples [0, 1]; process 1 holds [2, 3]
    assert local["x"].shape[0] == local_batch_size(4) == 2
    assert float(local["x"][0, 0, 0]) == 2.0 * pid

    batch = shard_batch(mesh, local)
    assert batch["x"].shape == (4, 2, 3)
    with mesh:
        mean = jax.jit(lambda b: jnp.mean(b["x"]))(batch)
    assert abs(float(mean) - 1.5) < 1e-6, float(mean)
    loader.close()
    print(f"child {pid} ok mean={float(mean)}", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_data_path(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=2"])
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no accelerator claims at startup
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")

    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        env=env, text=True, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=_REPO) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert f"child {pid} ok" in out, out
