"""Child process for the 2-process jax.distributed test
(test_distributed.py).  Run as:

    python distributed_child.py <pid> <nproc> <port> <ref.npy>

Exercises, for real (no monkeypatching):
* jax.distributed.initialize via parallel.mesh.init_distributed;
* the per-process IO branch (jax.make_array_from_process_local_data,
  parallel.sharded.global_put_local);
* the full sharded formod with distributed result gathering
  (global_put callback placement + host_gather allgather).
"""
import sys

import numpy as np


def main() -> int:
    pid, nproc, port, ref_file = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from jurassic_tpu.parallel import (ShardedForwardModel, global_put_local,
                                       host_gather, init_distributed,
                                       make_mesh, ray_sharding)
    init_distributed(f"localhost:{port}", num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    devs = jax.devices()
    mesh = make_mesh(len(devs), 1, devices=devs)

    # --- per-process input loading (make_array_from_process_local_data)
    R, F = 2 * len(devs), 3
    full = np.arange(R * F, dtype=np.float64).reshape(R, F)
    rows = R // nproc
    local = full[pid * rows:(pid + 1) * rows]
    g = global_put_local(local, (R, F), ray_sharding(mesh, 2))
    assert g.shape == (R, F)
    assert not g.is_fully_addressable          # truly distributed
    np.testing.assert_array_equal(host_gather(g), full)

    # --- full sharded forward model across both processes
    from jurassic_tpu.models.synthetic import (limb_workload, synthetic_atm,
                                               synthetic_ctl,
                                               synthetic_fast_tables)
    ctl = synthetic_ctl(ng=2, nd=4)
    ctl.nlos, ctl.rayds, ctl.raydz = 32, 60.0, 6.0
    ft = synthetic_fast_tables(ctl, n_p=6, n_t=4, n_k=32)
    atm = synthetic_atm(ctl)
    obs = limb_workload(ctl, 6)
    model = ShardedForwardModel(ctl, mesh, fast_tables=ft)
    model.formod(atm, obs)
    assert np.isfinite(obs.rad).all()
    ref = np.load(ref_file)
    np.testing.assert_allclose(obs.rad, ref, rtol=1e-12, atol=0)
    print(f"DIST_OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
