"""Megakernel jaxpr op-census — a TPU-less proxy for VPU issue pressure.

Traces the Pallas kernel (no compile, no device) and counts jaxpr equations
by primitive. On a VPU, a (3,128) elementwise op costs the same issue slot
as a (1,128) op, so falling totals here track the issue-bound component of
kernel time. (Historical note: the removed PACK_* batching passes cut
24.6k -> 16.3k eqns on the flat scene yet measured slower on a real v5e —
op count is a proxy, not the objective; see megakernel.py header.)

    python tools/count_kernel_ops.py [--task flat_terrain_backlash]

`--slots` additionally estimates VPU issue slots from eqn output shapes:
an elementwise op producing (S…, 128) costs ceil(prod(S…)/8) slots (the VPU
datapath retires an (8,128) vreg per cycle), transcendentals cost a
multi-pass factor, and reductions pay log2 shuffle passes. That lower bound
divided into the clock gives a speed-of-light env rate for the kernel — the
number ARCHITECTURE.md's roofline section quotes against the measured rate.
"""

import argparse
import os
import sys
from collections import Counter

# Pure tracing needs no accelerator — pin CPU so running the census NEVER
# attaches a second client to the TPU tunnel (a second attach wedges any
# training run already holding the chip; learned the hard way in round 5).
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from open_duck_playground_tpu.envs import duck_base
from open_duck_playground_tpu.models import loader
from open_duck_playground_tpu.physics import forward as F
from open_duck_playground_tpu.physics import megakernel as MK


# Multi-pass cost factors for ops the VPU's special-function path expands
# into several instructions (approximate; TPU microarchitecture isn't
# public — factors chosen so the estimate stays a defensible LOWER bound).
_XCEND = {
    "exp": 3.0, "log": 3.0, "tanh": 4.0, "logistic": 4.0,
    "sin": 4.0, "cos": 4.0, "div": 2.0, "rsqrt": 2.0, "sqrt": 2.0,
    "pow": 6.0, "integer_pow": 2.0, "erf": 4.0,
}
# pure bookkeeping at trace level — no VPU datapath work
_FREE = {
    "reshape", "squeeze", "broadcast_in_dim", "convert_element_type",
    "slice", "transpose", "copy", "pjit", "custom_jvp_call", "closed_call",
}


def _eqn_slots(eqn) -> float:
    """Estimated VPU issue slots for one jaxpr eqn inside the kernel.

    Kernel arrays are (..., T=128) lane tiles; an elementwise op producing
    prod(leading)=S sublane rows retires ceil(S/8) (8,128) vregs. Reductions
    pay the same per-input cost plus log2(8)=3 cross-sublane shuffle passes
    when they collapse sublanes. Scalar ops cost one slot."""
    import math

    name = eqn.primitive.name
    if name in _FREE:
        return 0.0
    shape = None
    for v in eqn.outvars:
        aval = getattr(v, "aval", None)
        if aval is not None and getattr(aval, "shape", None):
            shape = aval.shape
            break
    if shape is None or len(shape) == 0:
        base = 1.0
    elif shape[-1] >= 128:
        sub = 1
        for s in shape[:-1]:
            sub *= s
        base = math.ceil(sub / 8) * (shape[-1] // 128)
    else:  # sub-lane-width arrays still occupy a vreg slot per 8 rows
        sub = 1
        for s in shape:
            sub *= s
        base = math.ceil(sub / (8 * 128))
        base = max(base, 1)
    if name.startswith("reduce_"):
        inshape = eqn.invars[0].aval.shape
        sub = 1
        for s in inshape[:-1]:
            sub *= s
        in_slots = math.ceil(sub / 8)
        axes = eqn.params.get("axes", ())
        nd = len(inshape)
        if (
            nd >= 3
            and inshape[-1] >= 128
            and axes
            and all(a < nd - 2 for a in axes)
        ):
            # leading-axis reduction, e.g. (k, 8, 128) -> (8, 128): the env
            # tile is untouched, so this is a plain add tree — in_tiles -
            # out_tiles vector adds, NO cross-sublane shuffle passes
            base = max(in_slots - base, 1)
        else:
            # collapses sublanes/lanes: input reads + log2(8)=3 shuffle passes
            base = in_slots + 3
    return base * _XCEND.get(name, 1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="flat_terrain_backlash")
    ap.add_argument("--substeps", type=int, default=10)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--slots", action="store_true",
                    help="estimate VPU issue slots + speed-of-light env rate")
    ap.add_argument("--clock_ghz", type=float, default=0.94,
                    help="TPU core clock (v5e ~0.94 GHz)")
    ap.add_argument("--tile", type=int, default=MK.LANE_TILE,
                    help="env tile: 128 (1-D lane) or 1024 (8x128 sublane)")
    ap.add_argument("--by_line", action="store_true",
                    help="attribute slots to source function:line "
                         "(region profile; needs --slots)")
    args = ap.parse_args()

    m, mj = loader.load_model(
        str(duck_base.XML_DIR / f"scene_{args.task}.xml"), timestep=0.002
    )
    B = args.tile
    qpos = jnp.tile(jnp.asarray(mj.keyframe("home").qpos, jnp.float32), (B, 1))
    qvel = jnp.zeros((B, m.spec.nv), jnp.float32)
    ctrl = jnp.tile(jnp.asarray(mj.keyframe("home").ctrl, jnp.float32), (B, 1))
    d0 = jax.jit(jax.vmap(lambda q, v, c: F.init(m, q, v, c)))(qpos, qvel, ctrl)
    MK.prepare(m, args.substeps, B)
    jaxpr = jax.make_jaxpr(
        lambda dd, cc: MK.megakernel_step_batched(
            m, dd, cc, n_substeps=args.substeps, tile=B
        )
    )(d0, ctrl)
    pallas = [
        e for e in jaxpr.jaxpr.eqns if e.primitive.name == "pallas_call"
    ]
    assert pallas, "no pallas_call in trace (batch not LANE_TILE-aligned?)"
    cnt: Counter = Counter()
    slots: Counter = Counter()
    by_line: Counter = Counter()

    def _src_key(eqn):
        # innermost user frame inside this repo (skip jax internals)
        try:
            frames = list(eqn.source_info.traceback.frames)
        except Exception:
            return "<unknown>"
        for fr in frames:
            fn = fr.file_name
            if "open_duck_playground_tpu" in fn:
                short = fn.split("open_duck_playground_tpu/")[-1]
                return f"{short}:{fr.function_name}:{fr.line_num}"
        return "<external>"

    def walk(jx, mult=1):
        for eqn in jx.eqns:
            cnt[eqn.primitive.name] += mult
            if args.slots:
                s = mult * _eqn_slots(eqn)
                slots[eqn.primitive.name] += s
                if args.by_line and s:
                    by_line[_src_key(eqn)] += s
            # a loop body is traced ONCE in the jaxpr but executes
            # `length` times — scale it (the substep fori_loop lowers to
            # scan), else the census undercounts the kernel ~n_substeps x
            inner_mult = mult
            if eqn.primitive.name == "scan":
                inner_mult = mult * int(eqn.params.get("length", 1))
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr, inner_mult)

    walk(pallas[0].params["jaxpr"])
    print(
        f"task={args.task} substeps={args.substeps} "
        f"total_eqns={sum(cnt.values())}"
    )
    for name, n in cnt.most_common(args.top):
        print(f"  {name:24s} {n}")
    if args.slots:
        total = sum(slots.values())
        per_substep = total / args.substeps
        # one kernel program = `tile` envs x `substeps` physics substeps
        env_rate = args.clock_ghz * 1e9 / total * B * args.substeps / 10
        print(f"\nestimated VPU issue slots: {total:.0f} total, "
              f"{per_substep:.0f}/substep (@{B} envs)")
        print(f"speed-of-light (issue-bound, {args.clock_ghz} GHz): "
              f"{env_rate:,.0f} env steps/s/chip (10 substeps/env step)")
        for name, n in slots.most_common(args.top):
            print(f"  {name:24s} {n:.0f}")
        if args.by_line:
            print("\nslots by source region (function:line, repo frames):")
            for key, n in by_line.most_common(args.top):
                print(f"  {n:9.0f}  {key}")


if __name__ == "__main__":
    main()
