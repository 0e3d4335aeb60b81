"""TPU kernel library: the hand-written Pallas ops behind the engine.

The hot op is the physics mega-kernel (`physics/megakernel.py`): the full
n-substep rigid-body step — FK, spatial algebra, mass matrix, RNE, servo
actuation, collision, constraint assembly, Newton solve, Euler integration,
sensors — fused into one Pallas TPU kernel with envs on the lane axis, so
state never round-trips HBM between substeps. Re-exported here as the
package's public kernel surface; `physics/forward.py` is the semantically
identical jnp reference implementation and fallback.
"""

from open_duck_playground_tpu.physics.megakernel import (  # noqa: F401
    megakernel_step_batched,
    prepare,
)

__all__ = ["megakernel_step_batched", "prepare"]
