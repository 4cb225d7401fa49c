"""Small pytree helpers."""

import jax
import jax.numpy as jnp


def fresh_buffers(tree):
    """Force every array leaf onto its own device buffer.

    XLA interns identical constants and scene inits alias fields (u == u_init
    == u_origin), which trips `donate_argnums` ("attempt to donate the same
    buffer twice"). An eager x+0 materializes distinct buffers.
    """
    return jax.tree.map(lambda x: x + jnp.zeros_like(x), tree)
