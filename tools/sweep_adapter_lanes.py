#!/usr/bin/env python3
"""Adapter-kernel register-pressure sweep (VERDICT r4 #6).

Hypothesis: the v4 fused kernel's ~20x op-level headroom (ROOFLINE.json,
4.1% of the VPU ceiling) is vreg SPILL — the fori_loop carries 2 patterns
x 9 state arrays of (8, LANES) int32 (~18 * LANES/128 vregs live; 144 at
the default 1024 lanes), far past the register file, so every char pays
VMEM spill traffic on the serial Myers chain. Smaller LANES shrinks the
live set at the cost of more grid blocks.

Runs tools/profile_adapter.py (kernel-only tiny-fetch protocol) in a
fresh subprocess per SCTAG_ADAPTER_LANES value, same shape (B=65536 reads x
3072 chars ~ 200 Mbp/call, the measurement floor per CLAUDE.md), and
writes ADAPTER_LANES.json. Each lane value costs one remote compile
(~3.5-8 min on axon).
"""

import json
import os
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
LANES = [int(x) for x in (sys.argv[1:] or ["1024", "512", "256", "128"])]
B = int(os.environ.get("SCTAG_PROF_B", "65536"))

rows = {}
for lanes in LANES:
    env = dict(os.environ)
    env["SCTAG_ADAPTER_LANES"] = str(lanes)
    env["SCTAG_PROF_B"] = str(B)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "profile_adapter.py")],
        capture_output=True, text=True, env=env, timeout=3000,
        cwd=str(REPO),
    )
    out = proc.stdout
    print(out)
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        rows[lanes] = {"error": proc.stderr[-300:]}
        continue
    m = re.search(r"kernel-only \(tiny fetch\): ([0-9.]+) ms/chunk -> "
                  r"([0-9.]+) Mbp/s", out)
    rows[lanes] = {
        "kernel_only_ms": float(m.group(1)) if m else None,
        "kernel_only_mbp_s": float(m.group(2)) if m else None,
        "wall_s": round(time.time() - t0, 1),
    }
    print(f"lanes={lanes}: {rows[lanes]}", flush=True)

best = max(
    (v.get("kernel_only_mbp_s") or 0, k) for k, v in rows.items()
)
result = {
    "sweep": rows,
    "B": B,
    "best_lanes": best[1],
    "best_mbp_s": best[0],
    "baseline_lanes_1024_mbp_s": rows.get(1024, {}).get("kernel_only_mbp_s"),
    "protocol": "kernel-only tiny fetch, fresh process per lane value",
}
(REPO / "ADAPTER_LANES.json").write_text(json.dumps(result, indent=1) + "\n")
print(json.dumps(result, indent=1))
