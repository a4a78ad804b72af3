"""True 2-process jax.distributed run on the CPU backend.

The multi-node analogue of the upstream MPI harness (SURVEY section 2.3:
rank-parallel ray batches, no per-step collectives): two OS processes,
each with two virtual CPU devices, form one 4-device global mesh; the
observation batch shards over all four devices; results gather to every
process.  This executes the REAL code paths (jax.distributed.initialize,
make_array_from_process_local_data, process_allgather) that
test_parallel.py's monkeypatch test only plumbs.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

HERE = Path(__file__).parent
REPO = HERE.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    # single-process reference on the same synthetic workload
    from jurassic_tpu.forward import ForwardModel
    from jurassic_tpu.models.synthetic import (limb_workload, synthetic_atm,
                                               synthetic_ctl,
                                               synthetic_fast_tables)
    ctl = synthetic_ctl(ng=2, nd=4)
    ctl.nlos, ctl.rayds, ctl.raydz = 32, 60.0, 6.0
    ft = synthetic_fast_tables(ctl, n_p=6, n_t=4, n_k=32)
    obs = limb_workload(ctl, 6)
    ForwardModel(ctl, fast_tables=ft).formod(synthetic_atm(ctl), obs)
    ref_file = tmp_path / "ref.npy"
    np.save(ref_file, obs.rad)

    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""))
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "distributed_child.py"),
             str(pid), "2", str(port), str(ref_file)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DIST_OK {pid}" in out, out
