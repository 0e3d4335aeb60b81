"""Measure the v5e VPU's sustained issue-slot rate (the megakernel's roofline).

The kernel-census roofline (`tools/count_kernel_ops.py --slots`) counts
"issue slots": one (8,128)-vreg elementwise instruction = 1 slot, an op on
(S,128) = ceil(S/8) slots, transcendentals pay a multi-pass factor. The
production megakernel retires ~2.4 census slots/cycle (ARCHITECTURE.md) —
but until round 5 the machine's actual sustainable rate was inferred, not
measured. This microbenchmark pins it: tight Pallas loops of *independent*
elementwise chains at the production op mix, timed on the real chip, slots
counted by the census rules.

Knobs per config:
  variant  fma    x = x*a + b per chain         (2 census slots/round/chain)
           add    x = x + b                      (1 slot)
           exp    x = exp(x * -0.5) + 0.25       (1 mul + 3 exp + 1 add = 5)
           col    ONE jaxpr op on (K,8,128)      (K slots; Mosaic unrolls to
                                                  K independent instructions)
           narrow (1,128) ops                    (1 slot, 1/8 datapath — tests
                                                  whether narrow ops still
                                                  consume a full issue slot)
  chains   number of independent dependency chains (jaxpr-level ILP)

Timing uses the two-point slope (t(iters2) - t(iters1)) so the pallas call /
loop-setup overhead cancels. Results print as JSON lines + a summary table.

Run (real TPU): python tools/vpu_issue_bench.py [--csv out.csv]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLOCK_GHZ = 0.94  # v5e nominal TensorCore clock (same constant as the census)
ROUNDS = 32  # unrolled op-rounds per fori_loop trip (amortizes trip overhead)


def _build(variant: str, chains: int, iters: int):
    """Returns (jitted_fn, input_array, census_slots_per_trip)."""
    sub = 1 if variant == "narrow" else 8
    if variant == "col":
        # one array (chains, 8, 128); each round is ONE jaxpr mul + add on the
        # whole stack -> Mosaic unrolls each into `chains` instructions
        shape = (chains, 8, 128)
        slots_per_round = 2 * chains

        def kernel(x_ref, o_ref):
            x = x_ref[...]
            a = jnp.float32(0.9997)
            b = jnp.float32(1.3e-4)

            def body(_, x):
                for _r in range(ROUNDS):
                    x = x * a + b
                return x

            x = jax.lax.fori_loop(0, iters, body, x)
            o_ref[...] = x

    else:
        shape = (chains, sub, 128)
        slots_per_round = {
            "fma": 2 * chains,
            "add": 1 * chains,
            "exp": 5 * chains,  # mul(1) + exp(3, census factor) + add(1)
            "narrow": 2 * chains,  # mul + add on (1,128)
        }[variant]

        def kernel(x_ref, o_ref):
            xs = [x_ref[c] for c in range(chains)]
            a_ = [jnp.float32(0.9993 + 7e-5 * c) for c in range(chains)]
            b_ = [jnp.float32(1e-4 * (c + 1)) for c in range(chains)]

            def body(_, xs):
                xs = list(xs)
                for _r in range(ROUNDS):
                    if variant == "exp":
                        xs = [
                            jnp.exp(x * jnp.float32(-0.5)) + jnp.float32(0.25)
                            for x in xs
                        ]
                    else:  # fma / add / narrow
                        if variant == "add":
                            xs = [x + b for x, b in zip(xs, b_)]
                        else:
                            xs = [x * a + b for x, a, b in zip(xs, a_, b_)]
                return tuple(xs)

            xs = jax.lax.fori_loop(0, iters, body, tuple(xs))
            for c in range(chains):
                o_ref[c] = xs[c]

    x = jnp.full(shape, 0.5, jnp.float32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(shape, lambda: (0,) * len(shape), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(shape, lambda: (0,) * len(shape), memory_space=pltpu.VMEM),
    )
    return jax.jit(fn), x, slots_per_round * ROUNDS


def _time(fn, x, reps=3, chain=4):
    """Time fn by chaining `chain` dependent calls and forcing a host
    readback. Through the axon relay, block_until_ready can return before
    the device has actually finished — a device->host copy of the result
    cannot (measured: single-call block_until_ready timing read 0.04 ms for
    a 38 ms kernel)."""
    np.asarray(fn(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = x
        for _ in range(chain):
            y = fn(y)
        np.asarray(y)  # readback: completes only after all chained kernels
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def measure(variant: str, chains: int, i1=200_000, i2=1_000_000):
    # trip counts sized so the i2 kernel runs tens of ms: dispatch through
    # the axon relay costs ~0.3-1 ms of jitter per call, which must be
    # negligible against the slope (t2 - t1)
    fn1, x, spt = _build(variant, chains, i1)
    fn2, _, _ = _build(variant, chains, i2)
    t1, t2 = _time(fn1, x), _time(fn2, x)
    dslots = (i2 - i1) * spt
    dt = t2 - t1
    spc = dslots / (dt * CLOCK_GHZ * 1e9)
    return {
        "variant": variant,
        "chains": chains,
        "slots_per_trip": spt,
        "dt_ms": round(dt * 1e3, 3),
        "slots_per_cycle": round(spc, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", file=sys.stderr)

    configs = (
        [("fma", c) for c in (1, 2, 4, 8, 16)]
        + [("add", c) for c in (1, 8)]
        + [("col", k) for k in (2, 4, 8)]
        + [("narrow", c) for c in (1, 8)]
        + [("exp", c) for c in (1, 8)]
    )
    rows = []
    for variant, chains in configs:
        r = measure(variant, chains)
        rows.append(r)
        print(json.dumps(r), flush=True)

    peak = max(r["slots_per_cycle"] for r in rows)
    print(f"\npeak sustained census slots/cycle: {peak}", file=sys.stderr)
    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)


if __name__ == "__main__":
    main()
