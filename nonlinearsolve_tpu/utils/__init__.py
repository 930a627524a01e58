from .norms import (apply_norm, default_tolerance, get_norm, get_tolerance,
                    l2_norm, linf_norm, nan_check, tree_dot, tree_size)
from .pytree import pytree_dataclass, static_config, tree_add, tree_scale


def tree_where(pred, a, b):
    """Select subtree ``a`` where ``pred`` (a scalar bool) else ``b``."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)
