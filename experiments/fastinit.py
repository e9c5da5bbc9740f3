"""Cheap deterministic parameter trees for latency experiments: same shapes
and dtypes as real init, built from a single iota pattern per leaf (timing is
identical to random weights on the MXU; avoids dozens of slow remote compiles
for RNG programs)."""

import jax
import jax.numpy as jnp


def fake_like_tree(shapes_dtypes_tree, scale=0.02):
    def mk(sd):
        shape, dtype = sd
        n = 1
        for s in shape:
            n *= s
        flat = (jnp.arange(n, dtype=jnp.float32) % 101 - 50) * (scale / 50)
        return flat.reshape(shape).astype(dtype)

    return jax.tree.map(mk, shapes_dtypes_tree, is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], tuple))


def fake_params(model, dtype=jnp.bfloat16, scale=0.02):
    """Build a PiZero param tree with fake values via eval_shape (no RNG).

    The whole tree is built by ONE jitted program (bench.py's recipe): the
    eager per-leaf version compiled one remote program per distinct leaf
    shape — dozens of ~15 s axon compiles before the experiment even
    started."""
    shapes = jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0), dtype))

    @jax.jit
    def make_all():
        pattern = (jnp.arange(128, dtype=jnp.float32) % 101 - 50) * (scale / 50)

        def mk(leaf):
            n = 1
            for s in leaf.shape:
                n *= s
            rows = -(-n // 128)
            tiled = jnp.broadcast_to(pattern, (rows, 128)).reshape(-1)
            return tiled[:n].reshape(leaf.shape).astype(leaf.dtype)

        return jax.tree.map(mk, shapes)

    return make_all()


def iota_weights(shape, dtype=jnp.bfloat16, scale=0.02):
    """Deterministic %101 iota-pattern tensor (the shared fake-weight recipe
    for standalone experiment arrays; fake_params covers whole param trees).
    Keeping ONE definition keeps cross-experiment numbers comparable."""
    n = 1
    for s in shape:
        n *= s
    flat = (jnp.arange(n, dtype=jnp.float32) % 101 - 50) * (scale / 50)
    return flat.reshape(shape).astype(dtype)


def tree_bytes(tree) -> int:
    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree))
