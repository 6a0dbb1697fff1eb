"""Plan-array staging: keep big plan constants out of compiled programs.

Arrays closed over inside ``jax.jit`` are embedded into the HLO as
literal constants.  Plans for large outputs carry hundreds of MB of index
and weight tables, which bloats every compile (and overflows the remote
compiler's request limit on tunneled backends).  ``staged(a)`` marks a
plan array so executors can hoist it into a runtime argument instead:

* default (no active mode): behaves exactly like ``jnp.asarray`` — the
  interpret-mode tests and ad-hoc calls see no difference;
* collect mode: records the array (deduped by identity) and returns it
  as a constant — used on a shape-only ``jax.eval_shape`` trace;
* apply mode: returns the traced argument that was passed for it.

Array identity is the registration key, so only *stable* plan-owned
arrays (dataclass fields) may be staged — never temporaries built during
tracing.  :func:`stage_program` packages the two-phase dance.
"""

from __future__ import annotations

import contextlib
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

_MODE = None  # None | ("collect", byid, order) | ("apply", byid)


def staged(a) -> jnp.ndarray:
    if _MODE is None:
        return jnp.asarray(a)
    kind, byid = _MODE[0], _MODE[1]
    key = id(a)
    if kind == "collect":
        if key not in byid:
            byid[key] = len(_MODE[2])
            _MODE[2].append(a)
        return jnp.asarray(a)
    try:
        return byid[key]
    except KeyError:
        raise RuntimeError(
            "staged() saw an array that was not registered during the "
            "collect trace — only stable plan-owned arrays may be staged"
        ) from None


@contextlib.contextmanager
def _mode(m):
    global _MODE
    prev = _MODE
    _MODE = m
    try:
        yield
    finally:
        _MODE = prev


def stage_program(
    program: Callable, *abstract_args
) -> Tuple[Callable, Tuple]:
    """Hoist every ``staged`` array in ``program`` into an argument.

    Returns ``(fn, consts)`` where ``fn(x..., consts)`` is traceable (and
    jittable) with the plan arrays passed as the final pytree argument,
    and ``consts`` is the tuple of numpy arrays to pass (device_put it
    once for repeated use).
    """
    byid: dict = {}
    order: List = []
    with _mode(("collect", byid, order)):
        jax.eval_shape(program, *abstract_args)
    index_of = dict(byid)

    def fn(*args):
        *xs, consts = args
        live = {k: consts[i] for k, i in index_of.items()}
        with _mode(("apply", live)):
            return program(*xs)

    return fn, tuple(order)
