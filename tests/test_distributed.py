"""Two-process jax.distributed bring-up over the CPU backend: validates the
multi-host initialization helper and that a psum spans both processes'
devices (the mechanism multi-host TPU slices use over ICI/DCN)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    from colorid_tpu.parallel import distributed
    coord, pid = sys.argv[1], int(sys.argv[2])
    distributed.initialize(coord, num_processes=2, process_id=pid)
    import jax
    import jax.numpy as jnp
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 procs
    assert distributed.is_multi_process()
    from jax.sharding import Mesh, PartitionSpec as P
    import numpy as np
    mesh = Mesh(np.array(jax.devices()).reshape(4), ("d",))
    f = jax.shard_map(
        lambda x: jax.lax.psum(x, "d"),
        mesh=mesh, in_specs=P("d"), out_specs=P("d"), check_vma=False,
    )
    local = jnp.arange(8.0).reshape(4, 2)
    import jax as j
    arr = j.make_array_from_process_local_data(
        j.sharding.NamedSharding(mesh, P("d")), np.ones((4, 2), np.float32)
    )
    out = jax.jit(f)(arr)
    total = float(jax.device_get(out.addressable_shards[0].data).sum())
    assert total == 16.0, total  # psum of ones over 4 shards, [2,2] each
    print(f"proc{pid} OK", flush=True)
    """
)


def test_two_process_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd="/root/repo",
            env={**os.environ, "PYTHONPATH": "/root/repo"},
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed bring-up timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    assert "proc0 OK" in outs[0][1]
    assert "proc1 OK" in outs[1][1]
