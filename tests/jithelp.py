"""Jit wrappers for tests.

On the tunneled TPU runtime every eager op dispatch pays ~35 ms of RTT, so
an un-jitted ``model.init``/``model.apply`` (hundreds of ops) costs tens of
seconds while the same computation under ``jax.jit`` is ONE dispatch — and
its compilation lands in the persistent cache (/tmp/jax_cache), so repeat
suite runs skip it entirely.  Tests route module calls through these
helpers; numerics are identical (the suite pins
``jax_default_matmul_precision='highest'`` in conftest).
"""

import jax


def jinit(model, *args, **kwargs):
    """``model.init`` under jit (kwargs must be pytrees, e.g. rngs)."""
    return jax.jit(lambda a, kw: model.init(*a, **kw))(args, kwargs)


def japply(model, variables, *args, **static):
    """``model.apply`` under jit; extra kwargs are baked in as static
    (mutable=, train=, return_attention=, …).  ``rngs=`` is passed through
    as a traced pytree when present."""
    rngs = static.pop("rngs", None)
    if rngs is not None:
        fn = jax.jit(lambda v, a, r: model.apply(v, *a, rngs=r, **static))
        return fn(variables, args, rngs)
    fn = jax.jit(lambda v, a: model.apply(v, *a, **static))
    return fn(variables, args)


def jcall(fn, *args):
    """Run any jax-traceable function once under jit."""
    return jax.jit(fn)(*args)
