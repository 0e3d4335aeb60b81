"""Megakernel jaxpr op-census — a TPU-less proxy for VPU issue pressure.

Traces the Pallas kernel (no compile, no device) and counts jaxpr equations
by primitive. On a VPU, a (3,128) elementwise op costs the same issue slot
as a (1,128) op, so falling totals here track the issue-bound component of
kernel time (the batching passes cut 24.6k -> 16.3k eqns on the flat scene).

    python tools/count_kernel_ops.py [--task flat_terrain_backlash] [--pack 0|1]
"""

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from open_duck_playground_tpu.envs import duck_base
from open_duck_playground_tpu.models import loader
from open_duck_playground_tpu.physics import forward as F
from open_duck_playground_tpu.physics import megakernel as MK


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="flat_terrain_backlash")
    ap.add_argument("--substeps", type=int, default=10)
    ap.add_argument(
        "--pack", type=int, default=None,
        help="override all PACK_* flags (1=batched, 0=per-body/per-row walk)",
    )
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()
    if args.pack is not None:
        MK.PACK_FK = MK.PACK_NEWTON = MK.PACK_SENSORS = bool(args.pack)

    m, mj = loader.load_model(
        str(duck_base.XML_DIR / f"scene_{args.task}.xml"), timestep=0.002
    )
    B = MK.LANE_TILE
    qpos = jnp.tile(jnp.asarray(mj.keyframe("home").qpos, jnp.float32), (B, 1))
    qvel = jnp.zeros((B, m.spec.nv), jnp.float32)
    ctrl = jnp.tile(jnp.asarray(mj.keyframe("home").ctrl, jnp.float32), (B, 1))
    d0 = jax.jit(jax.vmap(lambda q, v, c: F.init(m, q, v, c)))(qpos, qvel, ctrl)
    MK.prepare(m, args.substeps)
    jaxpr = jax.make_jaxpr(
        lambda dd, cc: MK.megakernel_step_batched(
            m, dd, cc, n_substeps=args.substeps
        )
    )(d0, ctrl)
    pallas = [
        e for e in jaxpr.jaxpr.eqns if e.primitive.name == "pallas_call"
    ]
    assert pallas, "no pallas_call in trace (batch not LANE_TILE-aligned?)"
    cnt: Counter = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            cnt[eqn.primitive.name] += 1
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)

    walk(pallas[0].params["jaxpr"])
    print(
        f"task={args.task} PACK_FK={MK.PACK_FK} substeps={args.substeps} "
        f"total_eqns={sum(cnt.values())}"
    )
    for name, n in cnt.most_common(args.top):
        print(f"  {name:24s} {n}")


if __name__ == "__main__":
    main()
