"""Autoregressive rollout under one jit.

Replaces the reference's Python inference loop
(``/root/reference/graphs4cfd/nn/model.py:303-321``) with ``jax.lax.scan``
over time steps: the whole n_out-step rollout is a single compiled program
(north-star design point, SURVEY §7.1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph import Graph


def _rollout(apply_fn, params, graph: Graph, n_out: int, num_fields: int):
    def step(field, _):
        g = graph.replace(field=field)
        pred = apply_fn(params, g)
        new_field = jnp.concatenate([field[:, num_fields:], pred], axis=1)
        return new_field, pred

    _, preds = jax.lax.scan(step, graph.field, None, length=n_out)
    # [n_out, V, num_fields] -> [V, num_fields*n_out]
    return jnp.transpose(preds, (1, 0, 2)).reshape(preds.shape[1], -1)


def solve(model, graph: Graph, n_out: int) -> jnp.ndarray:
    """Evaluate the model on the graph for ``n_out`` time steps.

    Matches ``GNN.solve`` semantics: predictions are fed back through the
    rolled field window; returns ``[V, num_fields*n_out]``.  The input
    graph is not mutated (functional — no field save/restore dance).
    A list/tuple of graphs is batched first, like the reference's
    ``Batch.from_data_list`` path (``model.py:308-311``).
    """
    assert n_out > 0, "n_out must be greater than 0."
    if isinstance(graph, (list, tuple)):
        from ..loader import collate
        graph = collate([g.numpy() for g in graph]).to_device()
    # LRU-bounded: a long-lived inference process sweeping horizons would
    # otherwise accumulate one compiled program per distinct n_out forever.
    cache = getattr(model, "_solve_cache", None)
    if cache is None:
        from collections import OrderedDict
        cache = model._solve_cache = OrderedDict()
    if n_out not in cache:
        cache[n_out] = jax.jit(partial(_rollout, model.apply, n_out=n_out,
                                       num_fields=model.num_fields))
        while len(cache) > 8:
            cache.popitem(last=False)
    cache.move_to_end(n_out)
    return cache[n_out](model.params, graph)
