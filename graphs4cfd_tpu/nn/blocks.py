"""Functional NN blocks — the ops layer of the framework.

TPU-native re-designs of the reference blocks
(``/root/reference/graphs4cfd/nn/blocks.py``), as pure functions over
parameter pytrees and padded arrays:

* ``gn_block``       — Battaglia GN block (``blocks.py:147-190``).
* ``down_mp``        — MuS grid-cluster pooling edge-model (``blocks.py:193-237``).
* ``pool_edges``     — runtime half of ``pool_edge`` (``blocks.py:51-68``);
                       the static half lives in ``ops.pool_edge_structure``.
* ``up_mp``          — MuS unpooling edge-model (``blocks.py:240-290``).
* ``edge_mp``        — REMuS line-graph MP (``blocks.py:293-333``).
* ``down_edge_mp``   — REMuS inter-level pooling (``blocks.py:336-381``).
* ``up_edge_mp``     — REMuS unpooling (``blocks.py:384-456``).
* ``edge_scalar_to_node_vector`` — projection-aggregation solve
                       (``blocks.py:88-114``) via closed-form pinverse.

Angle sets use the fixed-k gather layout from ``ops.angles`` (``[E, k, ·]``),
so every REMuS aggregation is a mean over a static axis.  Node aggregation
in ``gn_block`` uses the fixed-k reshape path when the graph has exact
indegree k (canonical k-NN layout), falling back to receiver-sorted
segment-mean otherwise (pooled MuS levels).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.segment import segment_mean, segment_sum, aggregate_fixed_k
from .mlp import apply_mlp, apply_mlp_tail


def window_plan_of(graph):
    """Extract the level-1 windowed-gather plan attached by ``loader.collate``
    (None when absent → XLA gather fallback)."""
    if not graph.has("wg_starts"):
        return None
    d = graph.data
    return (d["wg_starts"], d["wg_lidx"], d["wg_exc_pos"], d["wg_exc_idx"],
            d["wg_window"], d["wg_block_rows"],
            d.get("wg_exc_lpos"), d.get("wg_exc_nidx"),
            d.get("wg_stride", 0))


def folded_plan_of(graph, level: int = 1):
    """Extract the edge-row-blocked gather plan for the folded line-graph
    EdgeMP kernel (``ops.pallas_edgemp``; attached by ``loader.collate``
    for REMuS-style graphs, one per fixed-k level).  None → fall back to
    the node-layout paths."""
    tag = "wg_fold" if level == 1 else f"wg_fold{level}"
    if not graph.has(f"{tag}_starts"):
        return None
    d = graph.data
    return (d[f"{tag}_starts"], d[f"{tag}_lidx"], d[f"{tag}_exc_pos"],
            d[f"{tag}_exc_idx"], d[f"{tag}_window"],
            d[f"{tag}_block_rows"], d.get(f"{tag}_exc_lpos"),
            d.get(f"{tag}_exc_nidx"), d.get(f"{tag}_stride", 0))


def _sender_gather(vs, senders, sender_sort, window_plan):
    """Gather sender projections; prefers the windowed one-hot MXU kernel
    (``ops.pallas_gather``) — XLA's dynamic row gather costs ~57 ns/row on
    TPU and was ~43% of the MuS train step (BASELINE.md ledger)."""
    from ..config import ablation
    ab = ablation()
    if ab == "zero_vsg":           # profiling only — wrong numerics
        E = senders.shape[0]
        return jnp.zeros((E, vs.shape[-1]), vs.dtype)
    if ab == "bcast_vsg":          # profiling only — wrong numerics
        E = senders.shape[0]
        k = E // vs.shape[0]
        return jnp.broadcast_to(
            vs[:, None, :], (vs.shape[0], k, vs.shape[-1])
        ).reshape(E, vs.shape[-1])
    from ..config import record_choice
    if window_plan is not None:
        from ..ops import pallas_gather as pg
        window, block_rows = int(window_plan[4]), int(window_plan[5])
        if pg.supports(vs.shape[0], senders.shape[0], window, block_rows,
                       vs.shape[-1]):
            interpret = jax.default_backend() != "tpu"
            record_choice("sender_gather", "windowed")
            return pg.windowed_take(vs, window_plan, interpret=interpret)
    if sender_sort is not None:
        from ..ops.segment import gather_sorted_bwd
        record_choice("sender_gather", "sorted_bwd")
        return gather_sorted_bwd(vs, senders, *sender_sort)
    record_choice("sender_gather", "xla")
    return vs[senders]


def _halo_gather(vs_local, sender_halo, window_plan):
    """Graph-parallel sender gather: exchange boundary rows (or all_gather)
    into the device-local table, then gather — through the windowed MXU
    kernel when the partitioner attached a per-device plan over the local
    table, else a plain row gather.

    Comm/compute overlap (SURVEY §5): the local-row term of the gather is
    computed straight from ``vs_local`` — it does NOT depend on the
    ``all_to_all`` — and only the boundary-row term waits for the
    collective, so XLA's latency-hiding scheduler can run the local
    gather (and the other first-layer matmul terms, see caller) while the
    halo rows are in flight.  Numerically identical to gathering from the
    concatenated table (each row comes from exactly one term).  The split
    applies only in halo-table mode (indices are local-table positions);
    the all_gather fallback gathers global rows from the full table."""
    ex, lidx = sender_halo[0], sender_halo[1]
    table_mode = len(sender_halo) > 2 and sender_halo[2]
    tab = ex(vs_local)
    from ..config import ablation
    if ablation() == "serialize_halo":
        # forced-sequential control: every consumer of vs_local now also
        # depends on the completed collective, so the scheduler cannot run
        # the local term under the all_to_all.  Numerics unchanged.
        vs_local, tab = jax.lax.optimization_barrier((vs_local, tab))
    if window_plan is not None:
        from ..ops import pallas_gather as pg
        window, block_rows = int(window_plan[4]), int(window_plan[5])
        if pg.supports(tab.shape[0], lidx.shape[0], window, block_rows,
                       tab.shape[-1]):
            interpret = jax.default_backend() != "tpu"
            return pg.windowed_take(tab, window_plan, interpret=interpret,
                                    zero_tail=True)
    flat = lidx.reshape(-1)
    if not table_mode:
        return tab[flat]
    block = vs_local.shape[0]
    is_local = flat < block
    local_part = jnp.where(
        is_local[:, None],
        jnp.take(vs_local, jnp.minimum(flat, block - 1), axis=0), 0)
    halo = tab[block:]
    halo_part = jnp.where(
        is_local[:, None], 0,
        jnp.take(halo, jnp.maximum(flat - block, 0), axis=0))
    return local_part + halo_part


def _edge_first_layer(edge_mlp: dict, e, v, senders, receivers,
                      compute_dtype, fixed_k: Optional[int] = None,
                      sender_sort=None, window_plan=None,
                      sender_halo=None):
    """First edge-MLP layer with the gather fused *after* the matmul.

    ``W1 @ concat(e, v[s], v[r])`` ≡ ``e@We + (v@Ws)[s] + (v@Wr)[r]`` with
    ``W1 = [We; Ws; Wr]`` — sender/receiver projections are computed once
    per *node* (E ≈ k·V ⇒ ~k× fewer FLOPs on this layer) and the gathers
    move H-wide projections instead of the concatenated input.  Same math
    as the reference's concat (``blocks.py:181``) up to summation order.

    In the canonical fixed-k layout ``receivers == repeat(arange(V), k)``,
    so the receiver gather is a broadcast (and its backward a contiguous
    reshape-sum instead of a scatter-add — much cheaper on TPU).
    """
    lyr = edge_mlp["layers"][0]
    cd = compute_dtype
    act = cd if cd != jnp.float32 else jnp.float32
    w1 = lyr["w"].astype(cd)
    fe, fv = e.shape[-1], v.shape[-1]
    we, ws, wr = w1[:fe], w1[fe:fe + fv], w1[fe + fv:]
    vc = v.astype(cd)
    h = (e.astype(cd) @ we).astype(act)
    vs = (vc @ ws).astype(act)
    if sender_halo is not None:
        h = h + _halo_gather(vs, sender_halo, window_plan)
    else:
        h = h + _sender_gather(vs, senders, sender_sort, window_plan)
    vr = (vc @ wr).astype(act)
    if fixed_k is not None:
        V, H = vr.shape
        h = h + jnp.broadcast_to(vr[:, None, :],
                                 (V, fixed_k, H)).reshape(V * fixed_k, H)
    else:
        h = h + vr[receivers]
    return h + lyr["b"].astype(act)


def _gn_block_impl(params: dict,
             v: jnp.ndarray,
             e: jnp.ndarray,
             senders: jnp.ndarray,
             receivers: jnp.ndarray,
             *,
             fixed_k: Optional[int] = None,
             aggr: str = "mean",
             edge_mask: Optional[jnp.ndarray] = None,
             sender_sort=None,
             compute_dtype=jnp.float32,
             out_activation: Optional[str] = None,
             window_plan=None,
             sender_halo=None,
             skip_e_out: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One message-passing step: edge update → aggregate → node update.

    Matches ``GNBlock.forward`` (``blocks.py:175-186``): the edge MLP sees
    ``[e, v_sender, v_receiver]``, messages are mean-aggregated onto
    receivers, the node MLP sees ``[aggr, v]``.  Returns ``(v', e')``.

    ``out_activation='selu'`` applies the engines' inter-layer SELU to both
    outputs (``mus_gnn.py:320-366``) — inside the Pallas kernel on the
    fused path (saving an HBM roundtrip of both outputs per layer), as a
    trailing XLA-fused op otherwise.  Aggregation always consumes the
    pre-activation edge state, exactly as in the reference.

    ``sender_halo=(exchange_fn, lidx)`` runs the block graph-parallel: the
    sender projection is exchanged across the mesh axis (halo ``all_to_all``
    or all_gather fallback) into a device-local table gathered by ``lidx``;
    the fused Pallas kernels (incl. the in-kernel windowed gather over the
    local table, when the partitioner attached a per-device plan) are the
    same ones the single-device path uses — going multi-chip keeps the
    per-chip fast path.
    """
    num_nodes = v.shape[0]
    if fixed_k is not None and aggr == "mean" and edge_mask is None:
        from ..config import pallas_enabled
        if pallas_enabled():
            from ..ops import pallas_gnblock as pg
            if pg.supports(params["edge_mlp"], params["node_mlp"],
                           num_nodes, e.shape[-1], v.shape[-1], fixed_k):
                # whole-block fused kernel; only the sender gather stays out
                cd = compute_dtype
                act = cd if cd != jnp.float32 else jnp.float32
                w1 = params["edge_mlp"]["layers"][0]["w"]
                fe, fv = e.shape[-1], v.shape[-1]
                vs = (v.astype(cd) @ w1[fe:fe + fv].astype(cd)).astype(act)
                interpret = jax.default_backend() != "tpu"
                from ..config import ablation
                if sender_halo is not None:
                    ex, lidx = sender_halo[0], sender_halo[1]
                    tab = ex(vs)
                    if (not ablation()
                            and pg.supports_wg(window_plan, num_nodes,
                                               fixed_k,
                                               table_rows=tab.shape[0])):
                        # rolling flush cannot cover the trailing halo
                        # region of the local table — zero those dvs rows
                        # (their cotangent rides the exception path)
                        # skip_e_out composes with zero_tail: the skipped
                        # e′ store / zero-cotangent read is orthogonal to
                        # the trailing-halo dvs zeroing (ADVICE r3 #3 —
                        # carries the single-chip skip_e win to the
                        # sharded step)
                        e_new, v_new = pg.gn_block_fused_wg(
                            params["edge_mlp"], params["node_mlp"], e,
                            tab, v, fixed_k, window_plan, compute_dtype=cd,
                            interpret=interpret,
                            out_activation=out_activation,
                            zero_tail=True, skip_e_out=skip_e_out)
                    else:
                        vsg = tab[lidx.reshape(-1)]
                        e_new, v_new = pg.gn_block_fused(
                            params["edge_mlp"], params["node_mlp"], e,
                            vsg, v, fixed_k, compute_dtype=cd,
                            interpret=interpret,
                            out_activation=out_activation,
                            skip_e_out=skip_e_out)
                    return v_new, e_new
                if (not ablation()
                        and pg.supports_wg(window_plan, num_nodes,
                                           fixed_k)):
                    # windowed gather fused into the kernel (blocking
                    # follows the plan): no [E, H] vsg materialisation
                    # roundtrip through HBM
                    from ..config import record_choice as _rec
                    _rec("gn_block", "fused_wg")
                    e_new, v_new = pg.gn_block_fused_wg(
                        params["edge_mlp"], params["node_mlp"], e, vs, v,
                        fixed_k, window_plan, compute_dtype=cd,
                        interpret=interpret, out_activation=out_activation,
                        skip_e_out=skip_e_out)
                    return v_new, e_new
                from ..config import record_choice as _rec
                _rec("gn_block", "fused")
                vsg = _sender_gather(vs, senders, sender_sort, window_plan)
                e_new, v_new = pg.gn_block_fused(
                    params["edge_mlp"], params["node_mlp"], e, vsg, v,
                    fixed_k, compute_dtype=cd, interpret=interpret,
                    out_activation=out_activation, skip_e_out=skip_e_out)
                return v_new, e_new
    from ..config import record_choice as _rec
    _rec("gn_block", "unfused")
    h = _edge_first_layer(params["edge_mlp"], e, v, senders, receivers,
                          compute_dtype, fixed_k=fixed_k,
                          sender_sort=sender_sort, window_plan=window_plan,
                          sender_halo=sender_halo)
    e_new = apply_mlp_tail(params["edge_mlp"], h, start=1,
                           compute_dtype=compute_dtype)
    if fixed_k is not None:
        aggregated = aggregate_fixed_k(e_new, fixed_k, num_nodes,
                                       reduce=aggr, edge_mask=edge_mask)
    elif aggr == "mean":
        aggregated = segment_mean(e_new, receivers, num_nodes,
                                  mask=edge_mask, indices_are_sorted=True)
    else:
        aggregated = segment_sum(e_new, receivers, num_nodes,
                                 mask=edge_mask, indices_are_sorted=True)
    # node MLP first layer, concat-free: [aggr, v]@W1 = aggr@Wa + v@Wv
    nlyr = params["node_mlp"]["layers"][0]
    cd = compute_dtype
    act = cd if cd != jnp.float32 else jnp.float32
    nw1 = nlyr["w"].astype(cd)
    fa = aggregated.shape[-1]
    hn = (aggregated.astype(cd) @ nw1[:fa]).astype(act) \
        + (v.astype(cd) @ nw1[fa:]).astype(act) + nlyr["b"].astype(act)
    v_new = apply_mlp_tail(params["node_mlp"], hn, start=1,
                           compute_dtype=cd)
    if out_activation == "selu":
        v_new, e_new = jax.nn.selu(v_new), jax.nn.selu(e_new)
    return v_new, e_new


def gn_block(params, v, e, senders, receivers, **kw):
    """Dispatching GN block; see ``_gn_block_impl`` for semantics.

    LOUD dead-output contract (VERDICT r4 #5): when the caller asserts
    ``skip_e_out=True`` the returned edge state is ``None`` on EVERY
    path (fused kernels skip the e' store; the XLA fallback's e' is
    discarded) — accidental consumption fails at trace time instead of
    silently reading stale numbers.
    """
    v_new, e_new = _gn_block_impl(params, v, e, senders, receivers, **kw)
    if kw.get("skip_e_out"):
        from ..config import record_choice
        record_choice("skip", "gn_e_out")   # trace-time observability
        return v_new, None
    return v_new, e_new


def edge_mp(params, e, a, angle_src, **kw):
    """Dispatching EdgeMP; see ``_edge_mp_impl`` for semantics.

    Same loud dead-output contract as ``gn_block``: ``skip_a_out=True``
    returns ``a' = None`` on every path.
    """
    e_new, a_new = _edge_mp_impl(params, e, a, angle_src, **kw)
    if kw.get("skip_a_out"):
        from ..config import record_choice
        record_choice("skip", "edgemp_a_out")
        return e_new, None
    return e_new, a_new


def down_mp(params: dict,
            field: jnp.ndarray,
            e_rel: jnp.ndarray,
            parent: jnp.ndarray,
            num_coarse: int,
            *,
            activation: Optional[Callable] = jnp.tanh,
            node_mask: Optional[jnp.ndarray] = None,
            compute_dtype=jnp.float32) -> jnp.ndarray:
    """MuS pooling: per-fine-node edge model + cluster mean.

    Matches ``DownMP.forward`` (``blocks.py:219-234``): the edge MLP sees
    ``[e_rel, field]`` over every fine node; results are mean-reduced per
    coarse parent; tanh applied.  (The reference scatters by raw voxel id
    then compacts — identical to scattering by the compacted ``parent``.)
    """
    e = apply_mlp(params,
                  jnp.concatenate([e_rel, field], axis=-1),
                  compute_dtype=compute_dtype)
    coarse = segment_mean(e, parent, num_coarse, mask=node_mask)
    if activation is not None:
        coarse = activation(coarse)
    return coarse


def pool_edges(edge_attr: jnp.ndarray,
               fine_to_coarse: jnp.ndarray,
               num_coarse_edges: int) -> jnp.ndarray:
    """Runtime edge coalescing: mean of fine edge features per coarse edge.

    Matches ``pool_edge`` with ``aggr='mean'`` (``blocks.py:51-68``);
    ``fine_to_coarse`` is -1 for dropped self-loops / padded edges.
    """
    mask = fine_to_coarse >= 0
    return segment_mean(edge_attr, fine_to_coarse, num_coarse_edges,
                        mask=mask)


def up_mp(params: dict,
          field_coarse: jnp.ndarray,
          e_rel: jnp.ndarray,
          parent: jnp.ndarray,
          field_fine_skip: jnp.ndarray,
          *,
          activation: Optional[Callable] = jnp.tanh,
          compute_dtype=jnp.float32) -> jnp.ndarray:
    """MuS unpooling: per-fine-node edge model with skip connection.

    Matches ``UpMP.forward`` (``blocks.py:265-290``): MLP over
    ``[-e_rel, field_coarse[parent], skip]``, tanh applied.
    """
    x = jnp.concatenate([-e_rel, field_coarse[parent], field_fine_skip],
                        axis=-1)
    out = apply_mlp(params, x, compute_dtype=compute_dtype)
    if activation is not None:
        out = activation(out)
    return out


# --------------------------------------------------------------------- REMuS
def _edge_mp_impl(params: dict,
            e: jnp.ndarray,
            a: jnp.ndarray,
            angle_src: jnp.ndarray,
            *,
            aggr: str = "mean",
            compute_dtype=jnp.float32,
            window_plan=None,
            folded_plan=None,
            out_activation: Optional[str] = None,
            sender_halo=None,
            skip_a_out: bool = False
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """REMuS MP on the line graph (``EdgeMP.forward``, ``blocks.py:322-333``).

    ``a`` is ``[E, k, Fa]`` (angles grouped by receiver edge), ``angle_src``
    is ``[E, k]`` (sender-edge ids).  Angle MLP sees ``[a, e_send, e_recv]``;
    angles aggregate onto their receiver edge by mean over the k axis; edge
    MLP sees ``[aggr, e]``.  Returns ``(e', a')``.

    ``window_plan``: in the canonical layout ``angle_src[e] = senders[e]*k
    + arange(k)``, so ``es[angle_src]`` equals a *node-sender* row gather
    from the ``[V, k·H]``-reshaped edge table — the same windowed one-hot
    MXU plan built for the node gather applies verbatim (indices are the
    level's senders).

    Structurally EdgeMP *is* a GN block on the line graph — (angle, edge)
    states play (edge, node): same fused first layer, fixed-k mean, same
    second chain on ``[aggr, state]``.  When shapes qualify the whole
    layer therefore runs through the fused Pallas GN-block kernel
    (``ops.pallas_gnblock``) with only the angle-source gather outside,
    eliminating the XLA-autodiff residual spills of the ``[E·k, H]``
    angle chain (the dominant HBM traffic of the REMuS step).
    ``out_activation='selu'`` fuses the engine's inter-layer SELU.
    """
    E, k, _ = a.shape
    lyr = params["angle_mlp"]["layers"][0]
    cd = compute_dtype
    act = cd if cd != jnp.float32 else jnp.float32
    w1 = lyr["w"].astype(cd)
    fa, fe = a.shape[-1], e.shape[-1]
    wa, ws, wr = w1[:fa], w1[fa:fa + fe], w1[fa + fe:]
    ec = e.astype(cd)

    def gather_es(es):
        """``es[angle_src]`` as [E, k, H]; windowed MXU kernel when planned.

        Graph-parallel (``sender_halo``): the canonical layout makes the
        angle gather a *node-sender* row gather from the ``[V, k·H]``
        folded edge table, so the partitioned gather is one halo exchange
        of folded boundary rows + a local-table gather."""
        if sender_halo is not None:
            ex, lidx = sender_halo[0], sender_halo[1]
            tab = ex(es.reshape(E // k, k * es.shape[-1]))
            return tab[lidx].reshape(E, k, -1)
        if window_plan is not None and E % k == 0:
            from ..ops import pallas_gather as pg
            V = E // k
            win, br = int(window_plan[4]), int(window_plan[5])
            if pg.supports(V, E, win, br, k * es.shape[-1]):
                tab = es.reshape(V, k * es.shape[-1])
                interpret = jax.default_backend() != "tpu"
                return pg.windowed_take(tab, window_plan,
                                        interpret=interpret
                                        ).reshape(E, k, -1)
        return es[angle_src]

    if aggr == "mean" and fa % 128 == 0:
        from ..config import pallas_enabled
        if pallas_enabled():
            # folded-layout kernel: whole angle chain in [B, k·H] lane
            # blocks, gather fused as the node-style one-hot matmul on the
            # [V, k·H] table — no [E·k, H] asg materialisation at all
            # (single-device only; the GP path gathers from the halo table)
            if folded_plan is not None and E % k == 0 \
                    and sender_halo is None:
                from ..ops import pallas_edgemp as pf
                if pf.supports_folded(folded_plan, params["angle_mlp"],
                                      params["edge_mlp"], E, E // k, k,
                                      fa, fe):
                    from ..config import record_choice as _rec
                    _rec("edge_mp", "folded")
                    es = (ec @ ws).astype(act)
                    tab = es.reshape(E // k, k * es.shape[-1])
                    interpret = jax.default_backend() != "tpu"
                    return pf.edge_mp_folded(
                        params["angle_mlp"], params["edge_mlp"], a, tab,
                        e, k, folded_plan, compute_dtype=cd,
                        interpret=interpret,
                        out_activation=out_activation,
                        skip_a_out=skip_a_out)
            from ..ops import pallas_gnblock as pg
            if pg.supports(params["angle_mlp"], params["edge_mlp"], E,
                           fa, fe, k):
                from ..config import ablation
                es = (ec @ ws).astype(act)
                if ablation() == "zero_vsg":   # profiling only (wrong math)
                    asg = jnp.zeros((E * k, es.shape[-1]), es.dtype)
                else:
                    asg = gather_es(es).reshape(E * k, -1)
                from ..config import record_choice as _rec
                _rec("edge_mp", "fused")
                interpret = jax.default_backend() != "tpu"
                a_new, e_new = pg.gn_block_fused(
                    params["angle_mlp"], params["edge_mlp"],
                    a.reshape(E * k, fa), asg, e, k,
                    compute_dtype=cd, interpret=interpret,
                    out_activation=out_activation,
                    skip_e_out=skip_a_out)
                return e_new, (None if skip_a_out
                               else a_new.reshape(E, k, -1))

    # XLA path: fused first angle layer Wa@a + (e@Ws)[angle_src] + (e@Wr)
    # broadcast — sender/receiver projections once per edge, not per angle
    from ..config import record_choice as _rec
    _rec("edge_mp", "unfused")
    h = (a.astype(cd) @ wa).astype(act)
    es = (ec @ ws).astype(act)
    h = h + gather_es(es)
    h = h + (ec @ wr).astype(act)[:, None, :]
    a_new = apply_mlp_tail(params["angle_mlp"], h + lyr["b"].astype(act),
                           start=1, compute_dtype=cd)
    aggregated = a_new.mean(axis=1) if aggr == "mean" else a_new.sum(axis=1)
    e_new = apply_mlp(params["edge_mlp"],
                      jnp.concatenate([aggregated, e], axis=-1),
                      compute_dtype=cd)
    if out_activation == "selu":
        e_new, a_new = jax.nn.selu(e_new), jax.nn.selu(a_new)
    return e_new, a_new


def down_edge_mp(params: dict,
                 e_fine: jnp.ndarray,
                 e_coarse: jnp.ndarray,
                 a12: jnp.ndarray,
                 angle_src12: jnp.ndarray,
                 *,
                 compute_dtype=jnp.float32,
                 sender_halo=None,
                 out_activation: Optional[str] = None) -> jnp.ndarray:
    """REMuS pooling via inter-level angles (``DownEdgeMP.forward``,
    ``blocks.py:360-381``).  ``a12`` is ``[Ec, k, Fa]`` grouped by receiving
    coarse edge; ``angle_src12`` indexes fine edges.  Returns updated coarse
    edge features.  ``sender_halo=(exchange, lidx)``: graph-parallel
    gather of boundary fine-edge rows.

    Structurally this is a GN block on (inter-level angle, coarse edge)
    states with fine-edge sources, so it runs through the fused Pallas
    GN-block kernel when shapes qualify — same treatment as ``edge_mp``;
    the XLA fallback uses the concat-free first layer (``a@Wa +
    (e_fine@Ws)[src] + bcast(e_coarse@Wr)``).  ``out_activation='selu'``
    fuses the engine's post-pooling SELU."""
    Ec, k, fa = a12.shape
    cd = compute_dtype
    act = cd if cd != jnp.float32 else jnp.float32
    lyr = params["angle_mlp"]["layers"][0]
    w1 = lyr["w"].astype(cd)
    fe = e_fine.shape[-1]
    fc = e_coarse.shape[-1]
    wa, ws, wr = w1[:fa], w1[fa:fa + fe], w1[fa + fe:]
    es = (e_fine.astype(cd) @ ws).astype(act)

    def gather_src():
        if sender_halo is not None:
            ex, lidx = sender_halo[0], sender_halo[1]
            return ex(es)[lidx]
        return es[angle_src12]

    if fa % 128 == 0:
        from ..config import pallas_enabled
        if pallas_enabled():
            from ..ops import pallas_gnblock as pg
            if pg.supports(params["angle_mlp"], params["edge_mlp"], Ec,
                           fa, fc, k):
                asg = gather_src().reshape(Ec * k, -1)
                interpret = jax.default_backend() != "tpu"
                # the updated inter-level angles are never consumed —
                # always skip their [Ec*k, H] store + zero-cotangent read
                _, e_new = pg.gn_block_fused(
                    params["angle_mlp"], params["edge_mlp"],
                    a12.reshape(Ec * k, fa), asg, e_coarse, k,
                    compute_dtype=cd, interpret=interpret,
                    out_activation=out_activation, skip_e_out=True)
                return e_new
    h = (a12.astype(cd) @ wa).astype(act)
    h = h + gather_src()
    h = h + (e_coarse.astype(cd) @ wr).astype(act)[:, None, :]
    a_new = apply_mlp_tail(params["angle_mlp"], h + lyr["b"].astype(act),
                           start=1, compute_dtype=cd)
    aggregated = a_new.mean(axis=1)
    # concat-free second chain: [aggr, e_coarse] @ W1 = aggr@Wa' + ec@We'
    nlyr = params["edge_mlp"]["layers"][0]
    nw1 = nlyr["w"].astype(cd)
    hn = (aggregated.astype(cd) @ nw1[:aggregated.shape[-1]]).astype(act) \
        + (e_coarse.astype(cd) @ nw1[aggregated.shape[-1]:]).astype(act) \
        + nlyr["b"].astype(act)
    e_new = apply_mlp_tail(params["edge_mlp"], hn, start=1,
                           compute_dtype=cd)
    if out_activation == "selu":
        e_new = jax.nn.selu(e_new)
    return e_new


def edge_scalar_to_node_vector(edge_attr: jnp.ndarray,
                               unit_vec_pinv: jnp.ndarray) -> jnp.ndarray:
    """Solve per-node ``[ê_ij][u_j] = [u_ij]`` (``blocks.py:88-114``).

    ``edge_attr`` ``[V*k, F]`` receiver-sorted; ``unit_vec_pinv`` ``[V, 2, k]``
    precomputed pseudo-inverses.  Returns node vectors ``[V, F, 2]`` (the
    reference flattens this F-major to ``[V, 2F]``).
    """
    V = unit_vec_pinv.shape[0]
    k = unit_vec_pinv.shape[2]
    e = edge_attr.reshape(V, k, -1)             # [V, k, F]
    v = unit_vec_pinv @ e                        # [V, 2, F]
    return jnp.swapaxes(v, 1, 2)                 # [V, F, 2]


def project_node_vectors_to_edges(node_vec: jnp.ndarray,
                                  receivers: jnp.ndarray,
                                  unit_vec: jnp.ndarray) -> jnp.ndarray:
    """Project node vectors ``[V, F, 2]`` onto receiving edges' unit vectors
    → edge scalars ``[E, F]`` (cf. ``blocks.py:453-454``,
    ``remus_gnn.py:124-126``).

    In the canonical fixed-k layout ``receivers == repeat(arange(V), k)``,
    so the receiver gather is a broadcast (and its backward a contiguous
    reshape-sum instead of a ~57 ns/row scatter-add — BASELINE.md)."""
    E = receivers.shape[0]
    V, F, _ = node_vec.shape
    if E % V == 0:
        k = E // V
        g = jnp.broadcast_to(node_vec[:, None], (V, k, F, 2)).reshape(E, F, 2)
    else:
        g = node_vec[receivers]                  # [E, F, 2]
    return (g * unit_vec[:, None, :]).sum(axis=-1)


def up_edge_mp(params: dict,
               e_coarse: jnp.ndarray,
               unit_pinv_coarse: jnp.ndarray,
               interp_idx: jnp.ndarray,
               interp_w: jnp.ndarray,
               receivers_fine: jnp.ndarray,
               unit_vec_fine: jnp.ndarray,
               e_fine_skip: jnp.ndarray,
               *,
               compute_dtype=jnp.float32,
               interp_exchange=None) -> jnp.ndarray:
    """REMuS unpooling (``UpEdgeMP.forward``, ``blocks.py:408-456``):
    coarse edge scalars → coarse node vectors (pinverse) → k-NN-interpolated
    fine node vectors → projected fine edge scalars → MLP with skip.

    All indices are in *local level* numbering (coarse levels renumbered
    once on host, unlike the reference's per-forward ``v1[coarse_mask1]``
    scatter).  ``interp_exchange``: graph-parallel — extends the coarse
    node vectors with halo rows before interpolation (``interp_idx`` is
    then the partitioner's local-table index array)."""
    from ..ops.interp import knn_interpolate
    v_coarse = edge_scalar_to_node_vector(e_coarse, unit_pinv_coarse)
    Vc, F, _ = v_coarse.shape
    src = v_coarse.reshape(Vc, F * 2)
    if interp_exchange is not None:
        src = interp_exchange(src)
    v_fine = knn_interpolate(src, interp_idx, interp_w)
    v_fine = v_fine.reshape(-1, F, 2)
    e1 = project_node_vectors_to_edges(v_fine, receivers_fine, unit_vec_fine)
    # concat-free first layer: [e1, skip] @ W1 = e1@Wa + skip@Wb
    cd = compute_dtype
    act = cd if cd != jnp.float32 else jnp.float32
    lyr = params["layers"][0]
    w1 = lyr["w"].astype(cd)
    f1 = e1.shape[-1]
    h = (e1.astype(cd) @ w1[:f1]).astype(act) \
        + (e_fine_skip.astype(cd) @ w1[f1:]).astype(act) \
        + lyr["b"].astype(act)
    return apply_mlp_tail(params, h, start=1, compute_dtype=cd)


# ---------------------------------------------------------- API-parity shims
def restriction(graph, coarse_mask, edge_attr, edge_index, num_nodes,
                device=None):
    """Reference-compatible ``restriction`` (``blocks.py:9-32``): renumber a
    V¹-indexed coarse edge set into compacted coarse indices, in-place on
    the graph.  In this framework coarse levels are built in local
    numbering up front (``transforms.mugs``), so the runtime engines never
    call this — it exists for users porting reference-style code.
    """
    mask = jnp.asarray(coarse_mask)
    mask2idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    edge_index = jnp.asarray(edge_index)
    graph.senders = mask2idx[edge_index[0]]
    graph.receivers = mask2idx[edge_index[1]]
    graph.edge_attr = edge_attr
    return graph


def lstsq(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched least squares ``AX = B`` (``blocks.py:71-85``) via the
    closed-form k×2 pseudo-inverse when applicable, else jnp.linalg."""
    if A.ndim == 3 and A.shape[-1] == 2:
        from ..ops.linalg import pinv_k2
        return pinv_k2(A) @ B
    return jnp.linalg.lstsq(A, B)[0]


def pool_edge(idxHR_to_idxLR, senders, receivers, edge_attr, aggr="mean"):
    """Reference-compatible one-call ``pool_edge`` (``blocks.py:51-68``):
    host-side structure + device reduction in one step.  The engines use
    the split form (``ops.pool_edge_structure`` once + ``pool_edges`` per
    step) — this convenience wrapper serves interactive use.
    """
    import numpy as np
    from ..ops.coarsen import pool_edge_structure
    cs, cr, f2c, _ = pool_edge_structure(np.asarray(idxHR_to_idxLR),
                                         np.asarray(senders),
                                         np.asarray(receivers))
    if aggr == "mean":
        attr = pool_edges(jnp.asarray(edge_attr), jnp.asarray(f2c), len(cs))
    else:
        attr = segment_sum(jnp.asarray(edge_attr), jnp.asarray(f2c),
                           len(cs), mask=jnp.asarray(f2c >= 0))
    return (cs, cr), attr


# reference-namespace alias (nn/blocks.py:34-48)
from ..ops.interp import knn_interpolate  # noqa: E402,F401
# reference camelCase alias (blocks.py:88)
edgeScalarToNodeVector = edge_scalar_to_node_vector
