"""Static metadata wrappers for parameter pytrees.

Model hyperparameters stored inside parameter dicts (kernel sizes, layer
counts, resblock type, ...) must be trace-time constants, not traced
arrays. These subclasses behave exactly like their base types but are
registered as *static* pytree nodes: jit treats them as part of the tree
structure, device_put ignores them, and Python control flow can use them
directly.
"""

import jax


@jax.tree_util.register_static
class StaticInt(int):
    """int that jit treats as a compile-time constant."""


@jax.tree_util.register_static
class StaticFloat(float):
    """float that jit treats as a compile-time constant."""


@jax.tree_util.register_static
class StaticStr(str):
    """str carried in the pytree structure."""


@jax.tree_util.register_static
class StaticTuple(tuple):
    """tuple of plain values carried in the pytree structure."""
