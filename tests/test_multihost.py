"""Multi-host distribution: 2-process CPU bring-up of
``init_distributed`` + ``make_global_mesh`` (the TPU-native replacement
for the reference's DeepSpeed/NCCL multi-node path, DepictQA/src/train.py:
30-37).

Each subprocess gets 2 virtual CPU devices; the global mesh is
(data=2 hosts) x (tile=2 chips). The check computes a global psum over
both axes with shard_map — exercising a DCN-crossing collective — and a
data-parallel mean where each host contributes its own shard.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from image_restoration_agent_tpu.parallel.mesh import (
        init_distributed, make_global_mesh)

    pid = int(sys.argv[1]); port = sys.argv[2]
    init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    mesh = make_global_mesh({"tile": 2}, dcn_axis="data")
    assert mesh.shape == {"data": 2, "tile": 2}, mesh.shape
    # host boundary == data axis: row p of the mesh lives on process p
    for p in range(2):
        assert all(d.process_index == p for d in mesh.devices[p].ravel())

    from functools import partial
    import jax.numpy as jnp
    from jax.experimental import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    # global (4, 8) array sharded over both axes; psum over data+tile
    sharding = NamedSharding(mesh, P(("data", "tile")))
    global_shape = (4, 8)
    def make_local(idx):
        # process-local shards: rows 2p, 2p+1
        return np.arange(np.prod(global_shape), dtype=np.float32) \
            .reshape(global_shape)[idx]
    arrs = [
        jax.device_put(make_local(idx), d)
        for d, idx in sharding.addressable_devices_indices_map(
            global_shape).items()
    ]
    ga = jax.make_array_from_single_device_arrays(
        global_shape, sharding, arrs)

    @partial(shard_map.shard_map, mesh=mesh, in_specs=P(("data", "tile")),
             out_specs=P())
    def total(x):
        return jax.lax.psum(jnp.sum(x), ("data", "tile"))

    out = jax.jit(total)(ga)
    want = np.arange(32, dtype=np.float32).sum()
    np.testing.assert_allclose(np.asarray(out), want)
    print(f"proc {pid} ok", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd()
    procs = [
        subprocess.Popen([sys.executable, str(script), str(p), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for p in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out
