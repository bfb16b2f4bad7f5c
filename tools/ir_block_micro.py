"""Per-block microbenchmark: fused_ir_block vs xla_ir_block on the chip.

Each block shape of the FEAR-XS search path is timed in isolation,
scan-amortized (20 applications per dispatch on perturbed inputs so XLA
cannot CSE them), host-fetch synced. Relative numbers decide which blocks
the fused trunk should dispatch to the kernel.

    python tools/ir_block_micro.py --streams 128 [--blocks 4,5,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=128)
    ap.add_argument("--inner", type=int, default=20, help="block applications per dispatch")
    ap.add_argument("--timed", type=int, default=5, help="dispatches per repeat")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--blocks", default=None, help="comma list of block ids (default: all)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--force", action="store_true",
                    help="time the kernel even when fused_eligible gates it out")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feartracker_tpu.models.fbnet import FEAR_XS_TRUNK
    from feartracker_tpu.ops.fused_trunk import fused_eligible, xla_ir_block
    from feartracker_tpu.ops.pallas.ir_block import fused_ir_block

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    S = args.streams
    rng = np.random.RandomState(0)

    # walk the search path (input 256² → stem 128²) collecting per-block shapes
    shapes = []
    H, C = 128, 16
    for i, sp in enumerate(FEAR_XS_TRUNK):
        shapes.append((i, sp, H, C))
        H //= sp.stride
        C = sp.out_channels
    wanted = None if args.blocks is None else {int(b) for b in args.blocks.split(",")}

    def timed_apply(fn, x, blk, sp):
        deltas = jnp.asarray(np.linspace(0.0, 0.01, args.inner), dtype)

        @jax.jit
        def many(x, blk):
            def body(acc, d):
                y = fn(x + d, blk, sp)
                return acc + jnp.sum(y.astype(jnp.float32)), None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), deltas)
            return out

        float(many(x, blk))  # compile + warm
        reps = []
        for _ in range(args.repeats):
            t0 = time.time()
            for _ in range(args.timed):
                r = many(x, blk)
            float(r)
            reps.append((time.time() - t0) / (args.timed * args.inner))
        return float(np.min(reps)) * 1e3  # ms per single block application

    for i, sp, H, C in shapes:
        if wanted is not None and i not in wanted:
            continue
        ce = C * sp.expansion
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
        blk = {
            "expand": None if sp.expansion == 1 else {"w": mk(C, ce), "b": mk(ce)},
            "dw": {"w": mk(sp.kernel, sp.kernel, ce), "b": mk(ce)},
            "project": {"w": mk(ce, sp.out_channels), "b": mk(sp.out_channels)},
        }
        x = jnp.asarray(rng.randn(S, H, H, C).astype(np.float32), dtype)
        eligible = fused_eligible(sp, x.shape, dtype)
        row = {"block": i, "spec": tuple(sp), "in": f"{H}x{H}x{C}", "eligible": bool(eligible)}
        row["xla_ms"] = round(timed_apply(xla_ir_block, x, blk, sp), 3)
        if eligible or (args.force and sp.expansion > 1):
            row["fused_ms"] = round(
                timed_apply(lambda x, b, s: fused_ir_block(x, b, s), x, blk, sp), 3
            )
            row["speedup"] = round(row["xla_ms"] / row["fused_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
