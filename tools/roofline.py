#!/usr/bin/env python3
"""Per-kernel roofline accounting (VERDICT r3 #4).

Three measurements, one JSON (ROOFLINE.json):

1. **Empirical VPU int32 instruction bound** — a Pallas microkernel running
   the exact Myers carry-chain op mix (20 int32 vector ops per iteration) on
   production-shaped (256, 1024) int32 registers with no memory traffic
   beyond one output store per block. This is the achievable ceiling for
   THIS chip + compiler, avoiding spec-sheet clock guesswork.

2. **Match kernel** (ops/match_pallas._match_full_kernel, hb default):
   kernel-only segs/s at the flagship shape (tiny-fetch protocol, CLAUDE.md)
   -> cell-chars/s -> ops/s using the hand-counted op breakdown below
   -> % of the microbench bound.

3. **Adapter kernel** (ops/adapter_pallas, v4): op count per char per strand
   from the fused loop body; rate taken from the recorded kernel-only Mbp/s
   (tools/profile_adapter.py protocol) or re-measured if absent.

Match-kernel op count per (pattern, read, char), int32 path, hb=True
(match_pallas.py:64-133): xv 1; xh 4 (and,add,xor,or); ph 3 (or,not,or);
mh 1; hb score 5 (and,and,sub,shr,add); ph<<1, mh<<1: 2; pv 3; mv 1 -> DP
step 20. Plus eq build: 4 selects on (BP,BR) + 4 (1,BR) compares ~ 4.1;
plus running-min 1. TOTAL ~ 25.1 ops/cell-char. The tie machinery runs once
per BLOCK (not per char) and measures <= 2-5% (MATCH_VARIANTS minonly).

Adapter kernel op count per (read, char) PER STRAND (adapter_pallas.py
fused body, lines ~143-175): eq chain 3 selects (+2 shared code-bit
compares/char amortized over 2 strands = 1); DP step without hb: xv 1, xh 4,
ph 3, mh 1, score 6 (2x cmp+cast+add), shifts 2, pv 3, mv 1 = 21; tie/min:
improve+tie 4 (2 cmp, 2 and), d select 1, cnt update 2, slot selects ~4
(NSLOT=2: per slot cmp+sel amortized) -> TOTAL ~ 37 ops/char/strand on
(8, LANES) blocks over 8 read-groups.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = pathlib.Path(__file__).resolve().parent.parent

MATCH_OPS_PER_CELL_CHAR = 25.1
ADAPTER_OPS_PER_CHAR_STRAND = 37.0
MICRO_OPS_PER_ITER = 21  # 20-op Myers chain + the eq^pv rotation


def _micro_kernel(x_ref, o_ref, *, iters: int, chains: int):
    """``chains`` INDEPENDENT copies of the 20-op Myers carry chain per
    iteration: the chain is latency-bound on its serial dependencies, so a
    single copy measures instruction LATENCY; independent copies expose the
    issue-throughput ceiling the way the real kernel's parallel eq-build/min
    work does. The reported bound takes the max over chains."""
    import jax
    import jax.numpy as jnp

    high = jnp.int32(1 << 15)
    state = []
    for c in range(chains):
        pv = x_ref[:, :] + c
        state += [pv, pv ^ 1, pv & 7, pv >> 3]

    def body(j, carry):
        out = []
        for c in range(chains):
            pv, mv, score, eq = carry[4 * c : 4 * c + 4]
            # the exact production DP chain (match_pallas._myers_hw_step, hb):
            xv = eq | mv                          # 1
            xh = (((eq & pv) + pv) ^ pv) | eq     # 4
            ph = mv | ~(xh | pv)                  # 3
            mh = pv & xh                          # 1
            score = score + (((ph & high) - (mh & high)) >> 15)  # 5
            ph = ph << 1                          # 1
            mh = mh << 1                          # 1
            pv = mh | ~(xv | ph)                  # 3
            mv = ph & xv                          # 1  -> 20 ops
            out += [pv, mv, score, eq ^ pv]  # rotation: the 21st op/iter
        return tuple(out)

    state = jax.lax.fori_loop(0, iters, body, tuple(state))
    acc = state[0]
    for c in range(1, chains):
        acc = acc + state[4 * c]
    o_ref[:, :] = acc + state[2]


def measure_vpu_bound(bp=256, br=1024, iters=2048, grid=64, reps=3):
    """Empirical int32 VPU op ceiling at the production block shape:
    max over 1/2/4 independent chains (latency- vs throughput-bound)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    best = 0.0
    per_chain = {}
    for chains in (1, 2, 4, 8):
        # halve the block sublanes as chains grow: carried VMEM state is
        # chains * 4 arrays and must stay well under the ~16 MB VMEM budget
        bp_c = max(8, bp // chains)
        x = jnp.asarray(
            np.arange(bp_c * br, dtype=np.int32).reshape(bp_c, br)
        )

        @functools.partial(jax.jit, static_argnames=("iters", "grid", "chains"))
        def run_c(x, iters: int, grid: int, chains: int, bp_c=bp_c):
            return pl.pallas_call(
                functools.partial(_micro_kernel, iters=iters, chains=chains),
                grid=(grid,),
                in_specs=[pl.BlockSpec((bp_c, br), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((bp_c, br), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bp_c, br), jnp.int32),
            )(x)

        try:
            np.asarray(run_c(x, iters, grid, chains))  # compile + warm
        except Exception as e:  # VMEM overflow at high chain counts
            print(f"  chains={chains} (bp={bp_c}): failed ({type(e).__name__})",
                  file=sys.stderr)
            continue
        cbest = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [run_c(x, iters, grid, chains) for _ in range(4)]
            np.asarray(outs[-1])[:1, :8]  # tiny fetch drains the queue
            dt = time.perf_counter() - t0
            ops = 4 * grid * iters * chains * MICRO_OPS_PER_ITER * bp_c * br
            cbest = max(cbest, ops / dt)
        per_chain[f"{chains}x_bp{bp_c}"] = round(cbest / 1e12, 3)
        print(f"  chains={chains} (bp={bp_c}): {cbest/1e12:.3f} T ops/s",
              file=sys.stderr)
        best = max(best, cbest)
    return best, per_chain


def measure_match_kernel(n_segs=1 << 20, reps=3):
    """Kernel-only flagship rate (bench shape, tiny-fetch protocol)."""
    import jax.numpy as jnp
    import numpy as np

    from bench import make_inputs
    from sctagger_tpu.core.packing import LENIENT_TABLE, encode_seqs
    from sctagger_tpu.models.matcher import _build_patterns
    from sctagger_tpu.ops.match_pallas import (
        DEF_BP, DEF_BR, match_full_tpu, prep_peq_cols, prep_segs_T,
    )
    from sctagger_tpu.ops.myers import build_peq_multi

    segs, barcodes = make_inputs(131072)
    bl = 16
    pat_codes = _build_patterns(barcodes, bl)
    peq = build_peq_multi(pat_codes)
    peq_j = jnp.asarray(prep_peq_cols(peq, bp=DEF_BP))
    codes, _ = encode_seqs(segs, pad_to=32, table=LENIENT_TABLE)
    seg_T = jnp.asarray(prep_segs_T(codes, ls=32, br=DEF_BR, r_pad=131072))
    np.asarray(match_full_tpu(seg_T, peq_j, bl))[:1, :8]  # warm
    k = max(1, n_segs // 131072)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [match_full_tpu(seg_T, peq_j, bl) for _ in range(k)]
        np.asarray(outs[-1])[:1, :8]
        dt = time.perf_counter() - t0
        best = max(best, k * 131072 / dt)
    p_pad = peq_j.shape[0]
    return best, p_pad, 32  # segs/s, padded patterns, padded ls


def main() -> None:
    from sctagger_tpu.runtime import configure_jax

    configure_jax()
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()

    vpu, per_chain = measure_vpu_bound()
    print(f"empirical VPU int32 bound: {vpu/1e12:.3f} T ops/s", file=sys.stderr)

    segs_s, p_pad, ls = measure_match_kernel()
    cells = segs_s * p_pad * ls
    match_ops = cells * MATCH_OPS_PER_CELL_CHAR
    print(
        f"match kernel: {segs_s:,.0f} segs/s = {cells/1e9:.1f} G cell-char/s"
        f" = {match_ops/1e12:.3f} T ops/s = {match_ops/vpu:.1%} of bound",
        file=sys.stderr,
    )

    # adapter: use the recorded kernel-only Mbp/s (CLAUDE.md protocol)
    adapter_mbps = None
    bs = HERE / "BENCH_STAGES.json"
    if bs.exists():
        d = json.loads(bs.read_text())
        adapter_mbps = d.get("lr_kernel_mbps", {}).get("value")
    if adapter_mbps is None:
        adapter_mbps = 1306.0  # 2026-08-20 record, tools/profile_adapter.py
    # both strands fused: chars/s * 2 strands * ops
    a_ops = adapter_mbps * 1e6 * 2 * ADAPTER_OPS_PER_CHAR_STRAND

    out = {
        "date": time.strftime("%Y-%m-%d"),
        "vpu_int32_bound_tops": round(vpu / 1e12, 3),
        "bound_by_chains": per_chain,
        "bound_note": (
            "empirical: N independent 20-op Myers carry chains on "
            "int32 VMEM registers (sublanes scaled down as N grows), no "
            "memory traffic — max over N in {1,2,4,8} (1 chain latency-bound; independent chains "
            "expose issue throughput). The achievable ceiling for this "
            "chip+compiler, not a spec-sheet number"
        ),
        "match": {
            "kernel_segs_per_s": round(segs_s, 1),
            "cell_chars_per_s": round(cells / 1e9, 2),
            "ops_per_cell_char": MATCH_OPS_PER_CELL_CHAR,
            "tops": round(match_ops / 1e12, 3),
            "pct_of_bound": round(100 * match_ops / vpu, 1),
        },
        "adapter": {
            "kernel_mbps": adapter_mbps,
            "ops_per_char_strand": ADAPTER_OPS_PER_CHAR_STRAND,
            "tops": round(a_ops / 1e12, 3),
            "pct_of_bound": round(100 * a_ops / vpu, 1),
            "note": (
                "rate from the recorded tiny-fetch kernel-only protocol at "
                ">=200 Mbp/call; state lives on (8, LANES) blocks with 8 "
                "read-groups on sublanes"
            ),
        },
    }
    (HERE / "ROOFLINE.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
