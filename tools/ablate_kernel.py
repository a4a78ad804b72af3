#!/usr/bin/env python3
"""Pool-kernel cost attribution via the in-kernel ablation stages.

Runs the flagship workload once per JURASSIC_POOL_ABLATE mode in a child
process (the ablation env is read at trace time, so each mode needs a
fresh jit cache) and reports end-to-end kernel seconds per call for:

  nosched  -- sort + corner bracketing + stream packing + output pull
              (no _pool_schedule, no prologue DMAs, empty loop)
  pureloop -- + _pool_schedule + pool prologue DMAs (empty loop body)
  empty    -- + per-segment stream tile load
  noega    -- + continua + source + RT integration (no EGA)
  onecombo -- + EGA with exactly one combo eval (no @pl.when/acc blend)
  full     -- the production kernel

Also times the tracer alone.  All timings are full wall time with a
device_get pull (the only trustworthy clock on the tunneled chip).
"""
import json
import os
import subprocess
import sys
import time

CHILD = r"""
import json, os, time
import numpy as np
import jax
from bench import build_workload, copy_obs
from jurassic_tpu.forward import ForwardModel

mode = os.environ.get("JURASSIC_POOL_ABLATE", "")
import jax.numpy as jnp

ctl, ft, atm, obs = build_workload(rays=None, channels=100, gases=4,
                                   nlos=400)
ctl.kernel = "auto"
m = ForwardModel(ctl, fast_tables=ft)
los = m.trace(atm, copy_obs(obs))
jax.block_until_ready(los)


def one():
    out = m._integrate_deferred(los)
    m._pop_pending_ok()
    return out


out = one()                                # compile
float(np.asarray(jnp.sum(out.rad)))        # force + pull once

reps = []
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        out = one()                        # async-queued dispatches
    float(np.asarray(jnp.sum(out.rad)))    # one forced sync per rep
    reps.append((time.perf_counter() - t0) / 10)
reps.sort()
print(json.dumps({"mode": mode or "full", "kernel_s": round(reps[1], 5),
                  "kernel_s_all": [round(r, 5) for r in reps],
                  "variant": m.last_variant}))
"""


def main():
    modes = ["nosched", "pureloop", "empty", "noega", "onecombo", ""]
    if len(sys.argv) > 1:
        modes = sys.argv[1:]
    rows = []
    for mode in modes:
        env = dict(os.environ)
        if mode:
            env["JURASSIC_POOL_ABLATE"] = mode
        else:
            env.pop("JURASSIC_POOL_ABLATE", None)
        env["PYTHONPATH"] = "/root/repo" + os.pathsep \
            + env.get("PYTHONPATH", "")   # keep the axon plugin path
        t0 = time.time()
        out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                             capture_output=True, text=True,
                             cwd="/root/repo")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"# {mode or 'full'} FAILED:\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        row = json.loads(line[-1])
        row["wall_s"] = round(time.time() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
