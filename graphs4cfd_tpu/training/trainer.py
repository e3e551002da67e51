"""Training loop: jit-compiled multi-step train step + host-side epoch loop.

TPU-native re-design of ``GNN.fit``
(``/root/reference/graphs4cfd/nn/model.py:152-301``) with identical training
semantics:

* rollout curriculum ``num_steps`` with ``add_steps`` tolerance; on
  increment the optimiser (and scheduler) are **re-initialised at base lr**
  (``model.py:289-298``);
* one optimiser step *per rollout step t*, not per batch
  (``model.py:226-254``); the whole t-loop runs inside one jitted
  ``lax.scan`` whose carry is (params, opt_state, field);
* predictions are fed back detached (``stop_gradient``; ``model.py:228``);
* gradient-norm logging *before* clipping (``model.py:238-251``), global
  L2 clip from ``grad_clip['epoch']`` on;
* validation rolls out ``max_n_out`` steps (``model.py:260-273``);
* ReduceLROnPlateau on training or validation loss; lr-floor early stop
  with a final checkpoint (``model.py:215-218``);
* checkpoint/resume restores weights, optimiser, scheduler, curriculum
  position and epoch (``model.py:175-185``), with ``.chk → .chk.bck``
  rename (``model.py:196-199``).

Instead of AMP GradScaler, ``mixed_precision`` selects bf16 matmul compute
(f32 params/accumulation) — no loss scaling needed on TPU.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph import Graph
from .config import TrainConfig
from .schedule import ReduceLROnPlateau
from .checkpoint import load_checkpoint, save_checkpoint
from .metrics_writer import MetricsWriter
from ..utils.profiling import trace_annotation
from ..nn.model import grad_norm2


def _adam_opt():
    # scale_by_adam + explicit lr multiply so the host can adjust lr
    # (plateau schedule) without rebuilding the optimiser state.
    return optax.scale_by_adam()


def make_train_step(apply_fn, criterion, num_fields: int, n_out: int,
                    grad_clip_limit: Optional[float]):
    """Build the jitted multi-rollout-step training function."""
    opt = _adam_opt()

    def train_step(params, opt_state, graph: Graph, lr, clip_on):
        target = graph.target

        def body(carry, t):
            params, opt_state, field = carry
            g = graph.replace(field=field)

            def loss_fn(p):
                pred = apply_fn(p, g)
                tgt = jax.lax.dynamic_slice_in_dim(
                    target, t * num_fields, num_fields, axis=1)
                return criterion(g, pred, tgt), pred

            (loss, pred), grads = jax.value_and_grad(loss_fn,
                                                     has_aux=True)(params)
            gnorm = grad_norm2(grads)
            if grad_clip_limit is not None:
                scale = jnp.where(
                    clip_on & (gnorm > grad_clip_limit),
                    grad_clip_limit / jnp.maximum(gnorm, 1e-12), 1.0)
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
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

    return jax.jit(train_step)


def make_val_step(apply_fn, criterion, num_fields: int, max_n_out: int):
    def val_step(params, graph: Graph):
        target = graph.target

        def body(field, t):
            g = graph.replace(field=field)
            pred = apply_fn(params, g)
            tgt = jax.lax.dynamic_slice_in_dim(
                target, t * num_fields, num_fields, axis=1)
            loss = criterion(g, pred, tgt)
            field = jnp.concatenate([field[:, num_fields:], pred], axis=1)
            return field, loss

        _, losses = jax.lax.scan(body, graph.field,
                                 jnp.arange(max_n_out, dtype=jnp.int32))
        return losses.mean()

    return jax.jit(val_step)


def fit(model, train_config: TrainConfig, train_loader,
        val_loader=None):
    """Train ``model`` — mirrors ``GNN.fit`` (``model.py:152-301``)."""
    cfg = train_config
    criterion = cfg["training_loss"]
    num_steps_list = cfg["num_steps"]
    max_n_out = num_steps_list[-1]
    num_steps = iter(num_steps_list)
    n_out = next(num_steps)

    opt = _adam_opt()
    opt_state = opt.init(model.params)
    lr = cfg["lr"]
    scheduler = None
    if cfg["scheduler"] is not None:
        scheduler = ReduceLROnPlateau(lr, cfg["scheduler"]["factor"],
                                      cfg["scheduler"]["patience"])
    initial_epoch = 1

    # ---- checkpoint backend (pickle .chk or step-versioned orbax) ----------
    orbax = None
    if cfg["checkpoint_format"] == "orbax":
        from .checkpoint import OrbaxCheckpointer
        orbax = OrbaxCheckpointer(
            os.path.join(cfg["folder"], cfg["name"] + "_orbax"))

    # ---- resume ------------------------------------------------------------
    state = None
    if cfg["checkpoint"] is not None:
        if orbax is not None:
            if orbax.latest_step() is not None:
                state = orbax.restore()
        elif os.path.exists(cfg["checkpoint"]):
            state = load_checkpoint(cfg["checkpoint"])
    if state is not None:
        print("Training from an existing check-point:",
              orbax.directory if orbax is not None else cfg["checkpoint"])
        # The checkpoint self-describes its architecture (model.py:122-129);
        # comparing arch dicts catches structure mismatches that a bare
        # leaf-shape comparison would miss (identical shapes, different
        # wiring).  Shape comparison stays as a fallback for weights-only
        # states without an arch entry.
        chk_arch = state.get("arch")
        if chk_arch is not None and model.arch is not None \
                and dict(chk_arch) != dict(model.arch):
            diff_keys = [k for k in (set(chk_arch) | set(model.arch))
                         if chk_arch.get(k) != model.arch.get(k)]
            raise ValueError(
                f"checkpoint {cfg['checkpoint']!r} does not match this "
                f"model's architecture — written by a different arch dict "
                f"(mismatched entries: {sorted(diff_keys)[:5]}); resume it "
                f"with the matching model class/arch")
        chk_shapes = [np.shape(x) for x in
                      jax.tree_util.tree_leaves(state["weights"])]
        own_shapes = [x.shape for x in
                      jax.tree_util.tree_leaves(model.params)]
        if chk_shapes != own_shapes:
            if len(chk_shapes) != len(own_shapes):
                first_mismatch = (f"leaf count {len(chk_shapes)} vs "
                                  f"{len(own_shapes)}")
            else:
                first_mismatch = next((a, b) for a, b in
                                      zip(chk_shapes, own_shapes) if a != b)
            raise ValueError(
                f"checkpoint {cfg['checkpoint']!r} does not match this "
                f"model's architecture: {len(chk_shapes)} saved arrays "
                f"vs {len(own_shapes)} parameters (first mismatch: "
                f"{first_mismatch}) — was it written by a different arch "
                f"dict?")
        model.params = jax.tree_util.tree_map(jnp.asarray, state["weights"])
        if state.get("optimiser") is not None:
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(opt_state),
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(jnp.asarray, state["optimiser"])))
        lr = state.get("lr", lr)
        if scheduler is not None and "scheduler" in state:
            scheduler.load_state_dict(state["scheduler"])
            lr = scheduler.lr
        if state["n_out"] > max_n_out:
            raise ValueError(
                f"checkpoint {cfg['checkpoint']!r} was saved at curriculum "
                f"position n_out={state['n_out']}, beyond this run's "
                f"num_steps={num_steps_list} — extend num_steps to cover "
                f"the checkpoint's position")
        while n_out < state["n_out"]:
            n_out = next(num_steps)
        initial_epoch = state["epoch"] + 1
    else:
        if cfg["checkpoint"] is not None:
            print("Not matching check-point file:", cfg["checkpoint"])
        print("Training from randomly initialised weights")

    # ---- .chk → .bck rename (model.py:196-199; orbax versions itself) -----
    path = os.path.join(cfg["folder"], cfg["name"] + ".chk")
    if orbax is None and os.path.exists(path):
        print("Renaming", path, "to:", path + ".bck")
        os.rename(path, path + ".bck")

    writer = MetricsWriter(
        os.path.join(cfg["tensor_board"], cfg["name"])
        if cfg["tensor_board"] is not None else None)

    compute_dtype = jnp.bfloat16 if cfg["mixed_precision"] else jnp.float32
    if cfg["mixed_precision"]:
        print("Training with bf16 matmul compute")
        model.compute_dtype = compute_dtype

    clip_limit = (cfg["grad_clip"]["limit"]
                  if cfg["grad_clip"] is not None else None)

    # ---- distribution: one mesh axis from TrainConfig ----------------------
    # devices > 1  → data parallelism (batch shards, exact global loss);
    # graph_devices > 1 → graph parallelism (each batch graph is ONE giant
    # mesh, edge-partitioned with halo exchange).  The 2-axis composition
    # is available via parallel.make_dp_gp_forward for inference/custom
    # loops; fit drives one axis with full curriculum/plateau/checkpoint
    # semantics preserved (per-t optimiser updates under the reduction).
    dp = int(cfg["devices"] or 1)
    gpd = int(cfg["graph_devices"] or 1)
    mesh = None
    if dp > 1 or gpd > 1:
        import jax as _jax
        from ..parallel import make_mesh
        need = max(dp, 1) * max(gpd, 1)
        assert len(_jax.devices()) >= need, \
            f"TrainConfig wants {need} devices, have {len(_jax.devices())}"
        mesh = make_mesh(num_data=max(dp, 1), num_graph=max(gpd, 1))
        print(f"Training on mesh {dict(mesh.shape)}")
    if dp > 1:
        for loader in (train_loader, val_loader):
            if loader is not None and hasattr(loader, "num_shards"):
                loader.num_shards = dp

    step_cache = {}

    def get_step(n):
        if n not in step_cache:
            if dp > 1 and gpd > 1:
                from ..parallel import make_dp_gp_train_step
                step_cache[n] = make_dp_gp_train_step(
                    model, criterion, mesh, n_out=n,
                    grad_clip_limit=clip_limit)
            elif dp > 1:
                from ..parallel import make_dp_train_step
                step_cache[n] = make_dp_train_step(
                    model.apply, criterion, model.num_fields, n,
                    clip_limit, mesh)
            elif gpd > 1:
                from ..parallel import make_gp_train_step
                step_cache[n] = make_gp_train_step(
                    model, criterion, mesh, n_out=n,
                    grad_clip_limit=clip_limit)
            else:
                step_cache[n] = make_train_step(
                    model.apply, criterion, model.num_fields, n, clip_limit)
        return step_cache[n]

    val_criterion = cfg["validation_loss"] or criterion
    if val_loader is None:
        val_step = None
    elif dp > 1 and gpd > 1:
        from ..parallel import make_dp_gp_val_step
        val_step = make_dp_gp_val_step(model, val_criterion, mesh, max_n_out)
    elif dp > 1:
        from ..parallel import make_dp_val_step
        val_step = make_dp_val_step(model.apply, val_criterion,
                                    model.num_fields, max_n_out, mesh)
    elif gpd > 1:
        from ..parallel import make_gp_val_step
        val_step = make_gp_val_step(model, val_criterion, mesh, max_n_out)
    else:
        val_step = make_val_step(model.apply, val_criterion,
                                 model.num_fields, max_n_out)

    def prepare(graph):
        """Host-side per-batch prep: GP partitions the collated graph;
        DP×GP re-groups the sharded batch and partitions each group."""
        if dp > 1 and gpd > 1:
            from ..parallel import partition_batches
            from ..parallel.graph_parallel import regroup_sharded
            graph = partition_batches(regroup_sharded(graph, dp), gpd)[0]
        elif gpd > 1:
            from ..parallel import partition_graph
            graph = partition_graph(graph, gpd)[0]
        return graph.to_device()

    print(f"Number of trainable parameters: {model.num_params}")
    sched_state = scheduler.state_dict() if scheduler else None

    def save_state(epoch):
        if orbax is not None:
            orbax.save(epoch, arch=model.arch, weights=model.params,
                       opt_state=opt_state, n_out=n_out, lr=lr,
                       scheduler_state=sched_state)
        else:
            model.save_checkpoint(path, n_out, epoch, opt_state=opt_state,
                                  lr=lr, scheduler_state=sched_state)

    for epoch in range(initial_epoch, cfg["epochs"] + 1):
        if lr < cfg["stopping"]:
            print(f"The learning rate is smaller than {cfg['stopping']}. "
                  "Stopping training.")
            save_state(epoch)
            break
        print(f"Hyperparameters: n_out = {n_out}, lr = {lr}")
        train_step = get_step(n_out)
        training_loss = 0.0
        gradients_norm = 0.0
        num_iter = 0
        t0 = time.time()
        edges = 0
        for graph in train_loader:
            with trace_annotation("host_to_device"):
                graph = prepare(graph)
            clip_on = (cfg["grad_clip"] is not None
                       and epoch > cfg["grad_clip"]["epoch"])
            with trace_annotation("train_step"):
                model.params, opt_state, loss, gnorm = train_step(
                    model.params, opt_state, graph, jnp.float32(lr),
                    jnp.bool_(clip_on))
            training_loss += float(loss)
            gradients_norm += float(gnorm)
            # valid (unpadded) edges only, matching bench.py's meter
            em = graph.get("edge_mask")
            edges += (int(np.asarray(em).sum()) if em is not None
                      else graph.num_edges) * n_out
            num_iter += 1
        training_loss /= max(num_iter, 1)
        gradients_norm /= max(num_iter, 1)
        # Failure detection: a non-finite loss means the run is lost — save
        # a post-mortem checkpoint and stop instead of burning epochs.
        # (Enable jax.config.update('jax_debug_nans', True) to localise.)
        if not (training_loss == training_loss
                and abs(training_loss) != float("inf")):
            post = path + f".nan_epoch{epoch}"
            print(f"Non-finite training loss at epoch {epoch}; saving "
                  f"post-mortem checkpoint to {post} and stopping.")
            model.save_checkpoint(post, n_out, epoch, opt_state=opt_state,
                                  lr=lr, scheduler_state=sched_state)
            break
        dt = time.time() - t0
        eps_rate = edges / dt if dt > 0 else 0.0
        print(f"Epoch: {epoch:4d}, Training   loss: {training_loss:.4e}, "
              f"Gradients: {gradients_norm:.4e}, edges/s: {eps_rate:.3e}")
        if epoch == initial_epoch:
            # fast-path observability: which plans attached and which
            # kernels the traced step actually engaged — a silent
            # fallback (":none"/":unfused"/":xla") is visible here
            from ..config import fast_path_report
            print(f"Fast paths: {fast_path_report()}")

        validation_loss = None
        if val_loader is not None:
            validation_loss = 0.0
            vit = 0
            for graph in val_loader:
                validation_loss += float(val_step(model.params,
                                                  prepare(graph)))
                vit += 1
            validation_loss /= max(vit, 1)
            print(f"Epoch: {epoch:4d}, Validation loss: {validation_loss:.4e}")

        writer.add_scalar("Loss/train", training_loss, epoch)
        if validation_loss is not None:
            writer.add_scalar("Loss/test", validation_loss, epoch)
        writer.add_scalar("lr", lr, epoch)
        writer.add_scalar("edges_per_s", eps_rate, epoch)

        # ---- lr schedule (model.py:279-283) -------------------------------
        if scheduler is not None:
            sched_loss = (training_loss
                          if cfg["scheduler"]["loss"][:2] == "tr"
                          else validation_loss)
            lr = scheduler.step(sched_loss)
            sched_state = scheduler.state_dict()

        # ---- checkpoint ----------------------------------------------------
        if not epoch % cfg["chk_interval"]:
            save_state(epoch)

        # ---- curriculum (model.py:289-298) --------------------------------
        if cfg["add_steps"]["loss"][:2] == "tr":
            tolerance_loss = training_loss
        elif cfg["add_steps"]["loss"][:3] == "val":
            tolerance_loss = validation_loss
        else:
            raise NameError("Invalid parameter config['add_steps']['loss'].")
        if tolerance_loss < cfg["add_steps"]["tolerance"] and n_out < max_n_out:
            n_out = next(num_steps)
            opt_state = opt.init(model.params)
            lr = cfg["lr"]
            if scheduler is not None:
                scheduler = ReduceLROnPlateau(lr, cfg["scheduler"]["factor"],
                                              cfg["scheduler"]["patience"])
                sched_state = scheduler.state_dict()

    writer.close()
    print("Finished training")
