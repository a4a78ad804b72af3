#!/usr/bin/env python3
"""Forward-model benchmark (BENCHMARK_FORMOD analogue, formod.c:71-181).

Workload: large limb ray batch on benchmark-scale synthetic EGA tables
(BASELINE.json configs[4]).  Methodology mirrors the reference harness:

* repeat-run bitwise consistency gate before any timing
  (formod.c:106-166: timings are refused if repeat runs deviate);
* steady-state kernel-pipeline repetitions (GPUdrivers.cu:226-237);
* metric: rays x channels / second per chip (BASELINE.json:2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the locally measured reference CPU
binary on the same physics (tools/measure_ref_baseline.py ->
BENCH_BASELINE.json); 1.0 when no baseline measurement exists.
"""
import argparse
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--gases", type=int, default=4)
    ap.add_argument("--nlos", type=int, default=160)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for CI smoke runs")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()
    if args.small:
        args.rays, args.channels, args.nlos, args.iters = 64, 8, 48, 3

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jurassic_tpu.forward import ForwardModel
    from jurassic_tpu.models.synthetic import (limb_workload, synthetic_atm,
                                               synthetic_ctl,
                                               synthetic_fast_tables)

    ctl = synthetic_ctl(ng=args.gases, nd=args.channels)
    ctl.nlos = args.nlos
    ctl.rayds = 20.0
    ctl.raydz = 1.0
    ft = synthetic_fast_tables(ctl)
    atm = synthetic_atm(ctl)
    obs = limb_workload(ctl, args.rays)

    model = ForwardModel(ctl, fast_tables=ft)
    los = model.trace(atm, obs)          # host prep + jitted tracer

    def step():
        out = model_integrate()
        jax.block_until_ready(out)
        return out

    def model_integrate():
        from jurassic_tpu.forward import rt_integrate
        return rt_integrate(
            model.dev_tbl, model.sr, model.st, model.nu, model.cc,
            model.window, los, los.tsurf, model.flags, model.ig_co2,
            model.ig_h2o, model.use_fast, False)

    # warm-up / compile (TIMER("warm-up"), formod.c:64-66)
    out0 = step()
    # repeat-run consistency gate (formod.c:106-166)
    out1 = step()
    dev = float(np.max(np.abs(np.asarray(out0.rad) - np.asarray(out1.rad))))
    if dev != 0.0:
        print(json.dumps({
            "metric": "rays*channels/s", "value": 0.0,
            "unit": "rays*channels/s", "vs_baseline": 0.0,
            "error": f"repeat runs deviate by {dev:g}; timing refused"}))
        return

    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = (time.perf_counter() - t0) / args.iters

    value = args.rays * args.channels / dt

    vs = 1.0
    bl = REPO / "BENCH_BASELINE.json"
    if bl.exists():
        ref = json.loads(bl.read_text()).get("ref_rays_channels_per_s", 0.0)
        if ref > 0:
            vs = value / ref  # both rays*channels/s; size-agnostic
    print(json.dumps({
        "metric": "rays*channels/s",
        "value": round(value, 1),
        "unit": "rays*channels/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
