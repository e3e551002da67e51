"""Data-parallel training over a device mesh.

The TPU-native replacement for the distribution the reference never had
(SURVEY §2.3): batch shards from ``loader.collate_sharded`` run under
``shard_map`` over the mesh's ``data`` axis; parameters are replicated and
gradients are ``pmean``-ed over ICI **per rollout step t** so the per-t
optimiser-update semantics of ``GNN.fit``
(``/root/reference/graphs4cfd/nn/model.py:226-254``) are preserved exactly
in the multi-chip setting.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph import Graph
from ..nn.model import grad_norm2


def _graph_specs(arrays: dict, axis: str = "data"):
    """P(axis) for every array key (leading shard axis)."""
    return {k: P(axis) for k in arrays}


def make_dp_train_step(apply_fn, criterion, num_fields: int, n_out: int,
                       grad_clip_limit: Optional[float], mesh: Mesh):
    """Build the jitted data-parallel multi-rollout-step train function.

    Expects graphs from ``collate_sharded`` with leading axis ==
    ``mesh.shape['data']``.
    """
    opt = optax.scale_by_adam()

    # exact-DP protocol: a criterion exposing ``distributed`` computes the
    # global-batch loss (psum of per-term numerators/denominators) inside
    # the per-device loss, so each device's backward yields its *partial*
    # contribution to the global gradient and one psum reconstructs it —
    # DP == single-device bit-for-bit up to reduction order, regardless of
    # unequal valid-node counts across shards
    dist = getattr(criterion, "distributed", None)

    def per_device(params, opt_state, arrays: dict, lr, clip_on, *,
                   statics: dict):
        # strip the leading size-1 shard axis; rebuild the Graph
        arrays = {k: v[0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        target = graph.target

        def body(carry, t):
            params, opt_state, field = carry
            g = graph.replace(field=field)

            def loss_fn(p):
                pred = apply_fn(p, g)
                tgt = jax.lax.dynamic_slice_in_dim(
                    target, t * num_fields, num_fields, axis=1)
                if dist is not None:
                    return dist(g, pred, tgt, "data"), pred
                return criterion(g, pred, tgt), pred

            (loss, pred), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            # cross-device gradient reduction per rollout step
            if dist is not None:
                # loss is already global.  With check_vma=False the
                # shard_map transpose turns the in-loss psum back into a
                # psum, so each device's backward already yields D× its
                # partial contribution; pmean therefore reconstructs the
                # exact global-batch gradient (psum of partials).
                grads = jax.lax.pmean(grads, "data")
            else:
                # legacy criteria: average of per-shard means
                grads = jax.lax.pmean(grads, "data")
                loss = jax.lax.pmean(loss, "data")
            gnorm = grad_norm2(grads)
            if grad_clip_limit is not None:
                scale = jnp.where(
                    clip_on & (gnorm > grad_clip_limit),
                    grad_clip_limit / jnp.maximum(gnorm, 1e-12), 1.0)
                grads = jax.tree_util.tree_map(lambda g_: g_ * scale, grads)
            updates, opt_state = opt.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            field = jnp.concatenate(
                [field[:, num_fields:], jax.lax.stop_gradient(pred)], axis=1)
            return (params, opt_state, field), (loss, gnorm)

        (params, opt_state, _), (losses, gnorms) = jax.lax.scan(
            body, (params, opt_state, graph.field),
            jnp.arange(n_out, dtype=jnp.int32))
        return params, opt_state, losses.mean(), gnorms.mean()

    def step(params, opt_state, graph: Graph, lr, clip_on):
        arrays, statics = graph.arrays(), graph.statics()
        fn = shard_map(
            partial(per_device, statics=statics),
            mesh=mesh,
            in_specs=(P(), P(), _graph_specs(arrays), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False)
        return fn(params, opt_state, arrays, lr, clip_on)

    return jax.jit(step, static_argnames=())


def make_dp_val_step(apply_fn, criterion, num_fields: int, max_n_out: int,
                     mesh: Mesh):
    """Sharded validation: rollout ``max_n_out`` steps feeding predictions
    back un-detached (reference ``model.py:260-273``), exact global loss
    per step via the distributed-criterion protocol."""
    dist = getattr(criterion, "distributed", None)

    def per_device(params, arrays: dict, *, statics: dict):
        arrays = {k: v[0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        target = graph.target

        def body(field, t):
            g = graph.replace(field=field)
            pred = apply_fn(params, g)
            tgt = jax.lax.dynamic_slice_in_dim(
                target, t * num_fields, num_fields, axis=1)
            if dist is not None:
                loss = dist(g, pred, tgt, "data")
            else:
                loss = jax.lax.pmean(criterion(g, pred, tgt), "data")
            field = jnp.concatenate([field[:, num_fields:], pred], axis=1)
            return field, loss

        _, losses = jax.lax.scan(body, graph.field,
                                 jnp.arange(max_n_out, dtype=jnp.int32))
        return losses.mean()

    def run(params, graph: Graph):
        arrays, statics = graph.arrays(), graph.statics()
        fn = shard_map(partial(per_device, statics=statics), mesh=mesh,
                       in_specs=(P(), _graph_specs(arrays)),
                       out_specs=P(), check_vma=False)
        return fn(params, arrays)

    return jax.jit(run)


def make_dp_rollout(apply_fn, num_fields: int, n_out: int, mesh: Mesh):
    """Sharded inference rollout: each device rolls out its shard."""

    def per_device(params, arrays: dict, *, statics: dict):
        arrays = {k: v[0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})

        def body(field, _):
            g = graph.replace(field=field)
            pred = apply_fn(params, g)
            return jnp.concatenate([field[:, num_fields:], pred], axis=1), pred

        _, preds = jax.lax.scan(body, graph.field, None, length=n_out)
        out = jnp.transpose(preds, (1, 0, 2)).reshape(preds.shape[1], -1)
        return out[None]  # restore shard axis

    def run(params, graph: Graph):
        arrays, statics = graph.arrays(), graph.statics()
        fn = shard_map(partial(per_device, statics=statics), mesh=mesh,
                       in_specs=(P(), _graph_specs(arrays)),
                       out_specs=P("data"), check_vma=False)
        return fn(params, arrays)

    return jax.jit(run)
