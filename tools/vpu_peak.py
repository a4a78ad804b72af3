#!/usr/bin/env python3
"""Empirical VPU speed-of-light probe for the compute roofline.

The public TPU spec sheets publish MXU TFLOP/s but not the VPU's
vector-ALU or transcendental issue rates, and the fused EGA kernel is
pure VPU work (no matmuls).  This probe measures, on THIS chip:

  fma_tflops  -- peak f32 element-wise FMA throughput: a Pallas kernel
                 running NACC independent FMA chains on [8, 256] vregs
                 inside a fori_loop (enough ILP to saturate the ALU
                 pipelines, zero memory traffic);
  exp_gops    -- transcendental (exp) issue rate, same harness.

bench.py uses these as the denominator of `compute_fraction` -- the
analogue of the reference's ptxas occupancy reports (Makefile:72) but
grounded in measurement rather than datasheets.  Results cached to
tools/vpu_peak_<kind>.json (the rate is a property of the chip class).
"""
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

SHAPE = (8, 256)          # 2 f32 vregs: lets the compiler dual-issue
NACC = 8                  # independent chains (pipeline ILP)
INNER = 512               # FMAs per chain per loop iteration


def _fma_kernel(loops):
    def kernel(o_ref):
        x = jnp.full(SHAPE, 1.0000001, jnp.float32)

        def body(_, accs):
            out = list(accs)
            # k-major interleave: NACC independent FMAs back to back so
            # the ALU pipeline never stalls on the chain dependency
            for _k in range(INNER // NACC):
                for i in range(NACC):
                    out[i] = out[i] * x + np.float32(1e-12)
            return tuple(out)

        accs = tuple(jnp.full(SHAPE, 0.1 * (i + 1), jnp.float32)
                     for i in range(NACC))
        accs = jax.lax.fori_loop(0, loops, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[:, :] = acc
    return kernel


def _exp_kernel(loops):
    def kernel(o_ref):
        def body(_, accs):
            out = list(accs)
            for _k in range(INNER // NACC):
                for i in range(NACC):
                    out[i] = jnp.exp(-out[i])
            return tuple(out)

        accs = tuple(jnp.full(SHAPE, 0.001 * (i + 1), jnp.float32)
                     for i in range(NACC))
        accs = jax.lax.fori_loop(0, loops, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[:, :] = acc
    return kernel


def _time(kernel_factory, loops, reps=5):
    fn = jax.jit(lambda: pl.pallas_call(
        kernel_factory(loops),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
    )())
    np.asarray(fn())                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn())
    return (time.perf_counter() - t0) / reps


def measure(force=False):
    kind = jax.devices()[0].device_kind
    cache = Path(__file__).parent / (
        "vpu_peak_" + kind.replace(" ", "_") + ".json")
    if cache.exists() and not force:
        return json.loads(cache.read_text())
    # size the kernels to ~0.3-1 s so the two-point overhead
    # cancellation is far above the tunneled-device timing noise
    # (host pulls pay erratic ~100 ms round trips on axon)
    loops = 1 << 18
    elems = SHAPE[0] * SHAPE[1]
    t1 = _time(_fma_kernel, loops)
    t2 = _time(_fma_kernel, loops * 2)
    fma_flops = 2 * elems * INNER * loops / max(t2 - t1, 1e-9)
    e1 = _time(_exp_kernel, loops // 8)
    e2 = _time(_exp_kernel, loops // 4)
    exp_ops = elems * INNER * (loops // 8) / max(e2 - e1, 1e-9)
    out = {"device_kind": kind,
           "fma_tflops": round(fma_flops / 1e12, 3),
           "exp_gops": round(exp_ops / 1e9, 2),
           "t_fma": [round(t1, 4), round(t2, 4)],
           "t_exp": [round(e1, 4), round(e2, 4)]}
    cache.write_text(json.dumps(out))
    return out


if __name__ == "__main__":
    print(json.dumps(measure(force=True)))
