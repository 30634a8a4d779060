#!/usr/bin/env python
"""One-shot on-chip validation + A/B measurement after device-path changes.

Runs, in order (each phase isolated in a subprocess so a failure or hang
cannot sink the rest):
  1. host/device byte parity + throughput  (tools/device_bench_parity.py)
  2. stage-profile A/Bs: bucketed vs sort probe, Pallas vs jnp dense
     front end                             (tools/device_stage_profile.py)
  3. Pallas Myers (use_pallas) lowering check under the x64 program
  4. bench.py (the scored metric)

Writes everything to ONCHIP_r04.json at the repo root (override with
CHROMAP_TPU_ONCHIP_OUT). Run with the normal environment (the axon TPU
must be reachable); per-phase timeouts keep a relay drop from hanging
the whole run.

Usage: python tools/onchip_validate.py [--quick]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, os.environ.get("CHROMAP_TPU_ONCHIP_OUT",
                                        "ONCHIP_r04.json"))


def run(cmd, timeout, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=e, cwd=ROOT)
        return {"rc": p.returncode, "wall_s": round(time.time() - t0, 1),
                "stdout": p.stdout[-4000:], "stderr": p.stderr[-2000:]}
    except subprocess.TimeoutExpired:
        return {"rc": -1, "wall_s": round(time.time() - t0, 1),
                "stdout": "", "stderr": f"TIMEOUT after {timeout}s"}


def main():
    quick = "--quick" in sys.argv
    res = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S")}

    probe = run([sys.executable, "-c",
                 "import jax; print([d.platform for d in jax.devices()])"],
                timeout=300)
    res["devices"] = probe
    if probe["rc"] != 0 or "tpu" not in probe["stdout"].lower():
        res["verdict"] = "relay unreachable or no TPU; aborting"
        print(json.dumps(res, indent=1))
        return 1

    res["parity"] = run(
        [sys.executable, "tools/device_bench_parity.py", "20000",
         "1" if quick else "3"], timeout=1800)
    if not quick:
        # dispatch-floor amortization sweep: bigger device chunks
        res["parity_batch16k"] = run(
            [sys.executable, "tools/device_bench_parity.py", "100000",
             "2", "16384"], timeout=2400)
        res["parity_batch4k"] = run(
            [sys.executable, "tools/device_bench_parity.py", "100000",
             "2", "4096"], timeout=2400)

    res["profile_bucket_pallas"] = run(
        [sys.executable, "tools/device_stage_profile.py"], timeout=1200)
    res["profile_sort_probe"] = run(
        [sys.executable, "tools/device_stage_profile.py"], timeout=1200,
        env={"CHROMAP_TPU_PROBE": "sort"})
    res["profile_jnp_dense"] = run(
        [sys.executable, "tools/device_stage_profile.py"], timeout=1200,
        env={"CHROMAP_TPU_DENSE_PALLAS": "0"})

    # Pallas Myers under the x64-enabled seeding program: lowering check
    # only (use_pallas defaults off; flipping it needs this to pass AND
    # the stage profile to justify it)
    res["pallas_myers_x64"] = run([sys.executable, "-c", """
import numpy as np
import chromap_tpu.ops.device_seed  # enables x64 like production
import jax.numpy as jnp
from chromap_tpu.ops.pallas_myers import myers_device, myers_jnp
e, L, N = 8, 100, 2048
rng = np.random.default_rng(0)
p = jnp.asarray(rng.integers(0, 4, (L + 2*e, N), dtype=np.int32))
t = jnp.asarray(rng.integers(0, 4, (L, N), dtype=np.int32))
err_p, end_p = myers_device(p, t, e, L)
err_j, end_j = myers_jnp(p, t, e, L)
ok = bool((np.asarray(err_p) == np.asarray(err_j)).all()
          and (np.asarray(end_p) == np.asarray(end_j)).all())
print("LOWERS-AND-MATCHES" if ok else "LOWERS-BUT-DIFFERS")
"""], timeout=900)

    if not quick:
        res["bench"] = run([sys.executable, "bench.py"], timeout=3600)

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(f"wrote {OUT}")
    for key in ("parity", "profile_bucket_pallas", "profile_sort_probe",
                "profile_jnp_dense", "pallas_myers_x64", "bench"):
        if key in res:
            r = res[key]
            tail = (r["stdout"].strip().splitlines() or [""])[-1]
            print(f"{key}: rc={r['rc']} {r['wall_s']}s  {tail}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
