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

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier

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


# A real stage-1 train step across process boundaries: metrics from a
# 2-process x 2-device run must equal the 1-process x 4-device run (the
# TPU-native replacement of SyncBN's cross-replica reduction,
# /root/reference/sync_batchnorm/batchnorm.py:92-113 — same global mesh,
# same program, only the host partitioning differs).
_TRAIN_CHILD = textwrap.dedent("""
    import json
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    nproc, pid, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from hrviton_tpu.core.mesh import (batch_sharding, init_distributed,
                                       make_mesh, replicated, shard_batch)
    if nproc > 1:
        init_distributed(f"localhost:{port}", num_processes=nproc,
                         process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from hrviton_tpu.config import (CondDiscriminatorConfig,
                                    ConditionTrainConfig, TOCGConfig)
    from hrviton_tpu.losses.perceptual import make_vgg_loss
    from hrviton_tpu.train import ConditionTrainer

    mesh = make_mesh()
    assert jax.device_count() == 4
    GB, CH, CW = 4, 32, 32
    tr = ConditionTrainer(TOCGConfig(ngf=4),
                          CondDiscriminatorConfig(input_nc=33, ndf=4),
                          ConditionTrainConfig(batch_size=GB))
    vgg = make_vgg_loss(image_hw=(CH, CW))
    state = tr.init(jax.random.PRNGKey(1), cond_hw=(CH, CW))
    # via HOST numpy: resharding device-committed trees compiles a per-leaf
    # transfer program (~0.3 s/leaf on CPU); from host it is instant
    to_host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    state = jax.device_put(to_host(state), replicated(mesh))
    vgg_vars = jax.device_put(to_host(vgg.variables), replicated(mesh))

    rng = np.random.default_rng(0)
    def arr(c, h=CH, w=CW):
        return rng.standard_normal((GB, h, w, c)).astype(np.float32)
    labels = rng.integers(0, 13, (GB, CH, CW)).astype(np.int32)
    full = {
        "cloth": {"paired": arr(3)},
        "cloth_mask": {"paired":
            rng.uniform(0, 1, (GB, CH, CW, 1)).astype(np.float32)},
        "parse_agnostic": arr(13), "densepose": arr(3),
        "parse_onehot": labels,
        "parse": (labels[..., None] == np.arange(13)).astype(np.float32),
        "pcm": rng.uniform(0, 1, (GB, CH, CW, 1)).astype(np.float32),
        "parse_cloth": arr(3),
    }
    if nproc > 1:
        lo, hi = pid * (GB // nproc), (pid + 1) * (GB // nproc)
        local = jax.tree_util.tree_map(lambda a: a[lo:hi], full)
        batch = shard_batch(mesh, local)
    else:
        batch = jax.device_put(full, batch_sharding(mesh))

    with mesh:
        _, metrics = tr.train_step(state, batch, jax.random.PRNGKey(2),
                                   vgg_vars)
        metrics = {k: float(v) for k, v in metrics.items()}
    print("METRICS " + json.dumps(metrics, sort_keys=True), flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_children(script_path, argv_per_child, device_count, env_base):
    env = dict(env_base)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={device_count}"])
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script_path)] + argv,
                              env=env, text=True, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, cwd=_REPO)
             for argv in argv_per_child]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def _metrics_from(out: str):
    import json
    for line in out.splitlines():
        if line.startswith("METRICS "):
            return json.loads(line[len("METRICS "):])
    return None


def test_two_process_train_step_matches_single_process(tmp_path):
    script = tmp_path / "train_child.py"
    script.write_text(_TRAIN_CHILD)

    port = _free_port()
    procs, outs = _run_children(
        script, [["2", "0", str(port)], ["2", "1", str(port)]],
        device_count=2, env_base=os.environ)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"2-proc child {pid} failed:\n{out}"
    two = [_metrics_from(o) for o in outs]
    assert two[0] is not None and two[0] == two[1]

    procs, outs = _run_children(script, [["1", "0", "0"]],
                                device_count=4, env_base=os.environ)
    assert procs[0].returncode == 0, f"1-proc run failed:\n{outs[0]}"
    one = _metrics_from(outs[0])

    assert set(one) == set(two[0])
    for k in one:
        assert abs(one[k] - two[0][k]) <= 1e-4 * max(1.0, abs(one[k])), \
            (k, one[k], two[0][k])


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


def test_shard_eval_batch_nondivisible_replicates():
    # eval/vis batches (lpips_batch, num_test_visualize) needn't divide the
    # data axis: shard_eval_batch replicates instead of erroring (VERDICT r4
    # weak #5); divisible batches still shard exactly like shard_batch
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from hrviton_tpu.core.mesh import (DATA_AXIS, make_mesh, shard_batch,
                                       shard_eval_batch)

    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8

    uneven = {"x": np.arange(3 * 2, dtype=np.float32).reshape(3, 2)}
    out = shard_eval_batch(mesh, uneven)
    assert out["x"].shape == (3, 2)
    assert out["x"].sharding.spec == P()  # replicated
    np.testing.assert_allclose(np.asarray(out["x"]), uneven["x"])

    even = {"x": np.arange(8 * 2, dtype=np.float32).reshape(8, 2)}
    a = shard_eval_batch(mesh, even)
    b = shard_batch(mesh, even)
    assert a["x"].sharding == b["x"].sharding
    np.testing.assert_allclose(np.asarray(a["x"]), np.asarray(b["x"]))
