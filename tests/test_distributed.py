"""Multi-host (multi-process) DCN bring-up for parallel/mesh.py.

The reference's multi-node story is NCCL-via-Lightning-Fabric plus SLURM
fan-out (saber/utils/slurm_submit.py:13-43, fabric_trainer.py:32-38);
here the analog is ``initialize_distributed`` → ``jax.distributed`` with
cross-process collectives. This test actually RUNS the bring-up: two
separate Python processes, two virtual CPU devices each, form one
4-device global mesh and

- aggregate devices (local 2 / global 4),
- psum across processes through ``pmap`` (the Fabric all-reduce analog),
- build a global ``make_mesh`` and run a jitted reduction over
  process-local shards (the multi-host trainer pattern).

On CPU the cross-process transport is Gloo over TCP — the same code path
a real pod would drive over DCN.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("PYTHONPATH", None)
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); port = sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from saber_tpu.parallel.mesh import initialize_distributed, make_mesh
    initialize_distributed(f"localhost:{{port}}", num_processes=2,
                           process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.local_device_count() == 2
    assert jax.device_count() == 4

    # cross-process all-reduce (pmap axis spans BOTH processes)
    x = jnp.arange(2.0) + 10 * pid
    y = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    assert y.tolist() == [22.0, 22.0], y.tolist()

    # global mesh + jitted reduction over process-local shards
    mesh = make_mesh(axis_names=("data",))
    assert mesh.devices.size == 4
    sh = NamedSharding(mesh, P("data"))
    local = np.arange(2.0) + 10 * pid
    g = jax.make_array_from_process_local_data(sh, local, global_shape=(4,))
    total = jax.jit(lambda a: jnp.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(g)
    assert float(total) == 22.0
    print(f"WORKER_{{pid}}_OK", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dcn_bringup(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed bring-up timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"WORKER_{pid}_OK" in out
