"""Host-side random param trees without per-initializer XLA programs.

``flax.linen.Module.init`` dispatches one tiny compiled program per
parameter; through the axon tunnel that costs minutes of pure compile
round-trips (measured: 366 s to the first bench stage for three
models). Benchmarks and dryruns validate program structure and
throughput of *random* weights, so the initializer distribution is
irrelevant — trace shapes with ``jax.eval_shape`` (zero compiles) and
fill on host with numpy. Shared by ``bench.py`` and
``__graft_entry__.py``.
"""

from __future__ import annotations

import numpy as np


def fast_init(init_fn, *args):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(init_fn, *args)
    rng = np.random.default_rng(0)

    def fill(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            a = rng.standard_normal(leaf.shape, dtype=np.float32) * 0.02
            return jnp.asarray(a, leaf.dtype)
        return jnp.zeros(leaf.shape, leaf.dtype)

    return jax.tree_util.tree_map(fill, shapes)
