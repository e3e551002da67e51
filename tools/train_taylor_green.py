"""NS-family end-to-end capability demonstration: train an NsMuSGNN on an
analytic incompressible-flow problem and measure long-horizon rollout
accuracy (VERDICT r2 missing #4).

The dataset is an exact Navier–Stokes solution: a decaying Taylor–Green
vortex in a uniformly translating frame (Galilean boost — still an exact
solution) on the unit torus:

    u(x,y,t) = a + U0 sin(2πX) cos(2πY) e^{-t/τ}
    v(x,y,t) = b − U0 cos(2πX) sin(2πY) e^{-t/τ}
    p(x,y,t) = (U0²/4)(cos(4πX) + cos(4πY)) e^{-2t/τ}
    X = x − a·t − x0,  Y = y − b·t − y0,  τ = 1/(8π²ν)

so the (u, v, p) rollout is scored against ground truth with no solver
noise.  The training pipeline is the full NsCircle uvp recipe
(``/root/reference/examples/training/NsMuSGNN/NsThreeScaleGNN.py``):
``ConnectKNN`` → ``ScaleNs`` (min-max u/v/p + Re) → ``ScaleEdgeAttr`` →
noise, ``glob`` = Re, ``GraphLoss(lambda_d=0.25)`` with a Dirichlet node
subset, rollout curriculum with per-t optimiser steps.

Usage: python tools/train_taylor_green.py [--epochs N] [--cpu]
Writes metrics to taylor_green_results.json.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TWO_PI = 2.0 * np.pi


def tg_fields(pos, t, prm):
    """Analytic (u, v, p) of the boosted Taylor–Green vortex at time t."""
    a, b, u0, nu, x0, y0 = prm
    tau = 1.0 / (8.0 * np.pi ** 2 * nu)
    env = np.exp(-t / tau)
    X = TWO_PI * (pos[:, 0:1] - a * t - x0)
    Y = TWO_PI * (pos[:, 1:2] - b * t - y0)
    u = a + u0 * np.sin(X) * np.cos(Y) * env
    v = b - u0 * np.cos(X) * np.sin(Y) * env
    p = 0.25 * u0 ** 2 * (np.cos(2 * X) + np.cos(2 * Y)) * env ** 2
    return np.concatenate([u, v, p], axis=1).astype(np.float32)


class TaylorGreenNs:
    """Analytic NS dataset in the framework's Graph format.

    ``fmt`` = 'uvp' (MuS/gMuS 3-field recipe) or 'uv' (REMuS 2-field).
    Topology (k-NN edges, scaled edge_attr) is cached per sim — positions
    are fixed; each access regenerates the analytic field window and
    runs the per-sample value transforms (ScaleNs, noise) on the copy.
    """

    def __init__(self, n_sims, n_nodes, n_out, topo_transform,
                 sample_transform, seed=0, T=120, dt=0.02, fmt="uvp"):
        self.n_sims, self.n_nodes, self.T, self.dt = n_sims, n_nodes, T, dt
        self.n_out = n_out
        self.nf = 3 if fmt == "uvp" else 2
        self.topo_transform = topo_transform
        self.sample_transform = sample_transform
        self.rng = np.random.default_rng(seed)
        self.sims = []
        self._base = [None] * n_sims
        for i in range(n_sims):
            r = np.random.default_rng(seed * 1000 + i)
            pos = r.random((n_nodes, 2)).astype(np.float32)
            # ν range keeps τ = 1/(8π²ν) ∈ [2.1, 6.3] s: the vortex decays
            # visibly over the 100-step (t=2) rollout horizon but retains
            # O(1) variance — with faster decay (ν ≥ 0.005) the true field
            # vanishes by step ~50 and r² = 1 − MSE/var divides by ~0,
            # making the long-horizon metric meaningless for ANY model
            prm = (r.uniform(-0.2, 0.2), r.uniform(-0.2, 0.2),
                   r.uniform(0.5, 1.0), r.uniform(0.002, 0.006),
                   r.random(), r.random())
            # 5% Dirichlet nodes exercise the λ_d L1 term of GraphLoss
            omega = (r.random((n_nodes, 1)) < 0.05).astype(np.float32)
            self.sims.append((pos, prm, omega))

    def __len__(self):
        return self.n_sims

    def reynolds(self, i):
        _, prm, _ = self.sims[i]
        return prm[2] / prm[3]          # Re = U0 · L / ν, L = 1

    def _base_graph(self, i):
        from graphs4cfd_tpu.graph import Graph
        if self._base[i] is None:
            pos, prm, omega = self.sims[i]
            g = Graph()
            g.pos = pos
            g.glob = np.full((self.n_nodes, 1), self.reynolds(i),
                             np.float32)
            g.field = tg_fields(pos, 0.0, prm)[:, :self.nf]
            g.target = g.field
            g.omega = omega
            g.bound = np.ones(self.n_nodes, np.uint8)
            self._base[i] = self.topo_transform(g)
        return self._base[i]

    def graph_at(self, i, t0, n_out, transform=None):
        pos, prm, _ = self.sims[i]
        base = self._base_graph(i)
        g = base.replace(
            field=tg_fields(pos, t0 * self.dt, prm)[:, :self.nf],
            target=np.concatenate(
                [tg_fields(pos, (t0 + 1 + j) * self.dt, prm)[:, :self.nf]
                 for j in range(n_out)], axis=1))
        tr = self.sample_transform if transform is None else transform
        return tr(g)

    def __getitem__(self, i):
        t0 = int(self.rng.integers(0, self.T - self.n_out - 1))
        return self.graph_at(i, t0, self.n_out)


# value ranges for ScaleNs min-max normalisation (|u|,|v| ≤ 0.2 + U0;
# Re = U0/ν ∈ [83, 500] for U0 ∈ [0.5, 1], ν ∈ [0.002, 0.006])
SCALING = {"u": (-1.3, 1.3), "v": (-1.3, 1.3), "p": (-0.6, 0.6),
           "Re": (50.0, 550.0)}


def build_arch(W, depth, scales):
    """V-cycle arch dict for 1-4 scales (reference layer naming:
    ``/root/reference/graphs4cfd/nn/mus_gnn.py:221-310`` — ``depth`` MP
    layers per level visit, ``2*depth`` at the coarsest)."""
    mp = ((W + 2 * W, (W, W, W), True), (W + W, (W, W, W), True))
    arch = {"edge_encoder": (2, (W, W, W), False),
            "node_encoder": (5, (W, W, W), False)}
    if scales == 1:
        arch.update({f"mp1{i}": mp for i in range(1, depth + 1)})
    else:
        for l in range(1, scales):                      # downward sweep
            arch.update({f"mp{l}1{i}": mp for i in range(1, depth + 1)})
            arch[f"down_mp{l}{l + 1}"] = (2 + W, (W, W, W), True)
        arch.update({f"mp{scales}{i}": mp
                     for i in range(1, 2 * depth + 1)})  # coarsest
        for l in range(scales - 1, 0, -1):              # upward sweep
            arch[f"up_mp{l + 1}{l}"] = (2 + W + W, (W, W, W), True)
            arch.update({f"mp{l}2{i}": mp for i in range(1, depth + 1)})
    arch["decoder"] = (W, (W, W, 3), False)
    return arch


MODEL_BY_SCALES = {1: "NsOneScaleGNN", 2: "NsTwoScaleGNN",
                   3: "NsThreeScaleGNN", 4: "NsFourScaleGNN"}


def build_arch_gmus(W, depth, scales):
    """gMuS arch (reference naming, ``mugs_gnn.py:11-134``): per-level edge
    encoders, implicit mask-select down / knn-interp-concat up; the first
    layer after each up has channel-doubled node inputs."""
    arch = {"edge_encoder": (2, (W, W, W), False)}
    for l in range(2, scales + 1):
        arch[f"edge_encoder{l}"] = (2, (W, W, W), False)
    arch["node_encoder"] = (5, (W, W, W), False)
    mp = ((W + 2 * W, (W, W, W), True), (W + W, (W, W, W), True))
    wide = ((W + 2 * 2 * W, (W, W, W), True), (W + 2 * W, (W, W, W), True))
    for l in range(1, scales):
        arch.update({f"mp{l}1{i}": mp for i in range(1, depth + 1)})
    arch.update({f"mp{scales}{i}": mp for i in range(1, 2 * depth + 1)})
    for l in range(scales - 1, 0, -1):
        arch[f"mp{l}21"] = wide
        arch.update({f"mp{l}2{i}": mp for i in range(2, depth + 1)})
    arch["decoder"] = (W, (W, W, 3), False)
    return arch


def build_arch_remus(W, depth, scales, n_in=1):
    """REMuS arch (reference naming, ``remus_gnn.py:11-117``): per-level
    angle/edge encoders, EdgeMP pairs, angle-pair down, pinv-interp up."""
    arch = {"angle_encoder": (4, (W, W), True)}
    for l in range(2, scales + 1):
        arch[f"angle_encoder{l - 1}{l}"] = (4, (W, W), True)
        arch[f"angle_encoder{l}"] = (4, (W, W), True)
    arch["edge_encoder"] = (n_in + 2, (W, W), True)
    for l in range(2, scales + 1):
        arch[f"edge_encoder{l}"] = (n_in + 2, (W, W), True)
    mp = ((W + 2 * W, (W, W), True), (W + W, (W, W), True))
    if scales == 1:
        arch.update({f"mp1{i}": mp for i in range(1, 2 * depth + 1)})
    else:
        for l in range(1, scales):
            arch.update({f"mp{l}1{i}": mp for i in range(1, depth + 1)})
            arch[f"down_mp{l}{l + 1}"] = mp
        arch.update({f"mp{scales}{i}": mp
                     for i in range(1, 2 * depth + 1)})
        for l in range(scales - 1, 0, -1):
            arch[f"up_mp{l + 1}{l}"] = (W + W, (W, W, W), True)
            arch.update({f"mp{l}2{i}": mp for i in range(1, depth + 1)})
    arch["decoder"] = (W, (W, 1), False)
    return arch


MODEL_BY_SCALES_GMUS = {2: "NsTwoGuillardScaleGNN",
                        3: "NsThreeGuillardScaleGNN",
                        4: "NsFourGuillardScaleGNN"}


def family_topo(fam, scales, cells=None, spatial_sort=True):
    """Topology-transform pipeline per family — shared between training
    and the rollout-regression gate (tests/test_rollout_regression.py)
    so the gate reconstructs the exact training-time graph build.

    ``spatial_sort=False`` drops the Morton reorder — required by the
    equivariance checks, which compare outputs row-by-row across two
    builds (rotation changes the Morton order, so sorted builds number
    the same physical node differently; the model itself is
    permutation-equivariant, the row comparison is not)."""
    import graphs4cfd_tpu as gfd
    from graphs4cfd_tpu.utils import Compose
    T = gfd.transforms
    # SpatialSort: Morton order keeps the windowed-MXU gather plans tight
    # (the w128 fused kernels engage for gMuS/REMuS)
    sort = [T.SpatialSort()] if spatial_sort else []
    if fam == "mus":
        return Compose([T.ConnectKNN(6, period=(1.0, 1.0)),
                        T.ScaleEdgeAttr(0.04)]
                       + ([T.GridClustering(list(cells))] if cells else []))
    if fam == "gmus":
        return Compose(sort + [T.GuillardCoarseningAndConnectKNN(
                            k=[6] * scales, period=(1.0, 1.0),
                            scale_edge_attr=[0.04 * 2 ** i
                                             for i in range(scales)]),
                        T.BuildKnnInterpWeights(6)])
    assert fam == "remus", fam
    return Compose(sort + [T.BuildRemusGraph(
                        num_levels=scales, k=5,
                        scale_edge_length=[0.04 * 2 ** i
                                           for i in range(scales)]),
                    T.BuildKnnInterpWeights(5)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-nodes", type=int, default=1024)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--family", choices=("mus", "gmus", "remus"),
                    default="mus")
    ap.add_argument("--scales", type=int, default=1, choices=(1, 2, 3, 4))
    ap.add_argument("--cells", type=str, default=None,
                    help="comma-separated GridClustering cell sizes "
                         "(default 0.08[,0.16[,0.32]] per --scales)")
    ap.add_argument("--tag", type=str, default="",
                    help="suffix for checkpoint/results/fixture filenames")
    ap.add_argument("--nmax", type=int, default=8)
    ap.add_argument("--sims", type=int, default=256)
    ap.add_argument("--rollout", type=int, default=100)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--dt", type=float, default=0.02)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--noise", type=float, default=0.0)
    # advance the curriculum only once genuinely below the frozen-field
    # baseline (the identity-well guard of the adv demo), as a fraction of
    # the measured identity 1-step loss
    ap.add_argument("--tolerance-frac", type=float, default=0.5)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init-from", type=str, default=None,
                    help="warm-start weights from this checkpoint with a "
                         "fresh optimiser at --lr")
    ap.add_argument("--stages", type=str, default=None,
                    help="comma-separated num_steps override (each stage "
                         "is a separately compiled program; remote compiles "
                         "are minutes each)")
    ap.add_argument("--eval-f32", action="store_true",
                    help="run the rollout eval in f32 compute")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--pin-fixture", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import graphs4cfd_tpu as gfd
    from graphs4cfd_tpu.utils import Compose
    from graphs4cfd_tpu.loader import DataLoader, collate
    from graphs4cfd_tpu.metrics import r2, rollout_rmse

    W = args.width
    fam = args.family
    fmt = "uv" if fam == "remus" else "uvp"
    cells = []
    if fam == "mus":
        arch = build_arch(W, args.depth, args.scales)
        cells = ([float(c) for c in args.cells.split(",")] if args.cells
                 else [0.08 * 2 ** i for i in range(args.scales - 1)])
        assert len(cells) == args.scales - 1, (cells, args.scales)
        model_cls_name = MODEL_BY_SCALES[args.scales]
    elif fam == "gmus":
        arch = build_arch_gmus(W, args.depth, args.scales)
        model_cls_name = MODEL_BY_SCALES_GMUS[args.scales]
    else:
        # non-periodic (the reference REMuS workload is NsEllipse point
        # clouds); the analytic fields are defined everywhere, boundary
        # nodes just see one-sided neighbourhoods
        arch = build_arch_remus(W, args.depth, args.scales)
        model_cls_name = ("NsRotEquiThreeScaleGNN" if args.scales == 3
                          else "REMuSGNN")
    topo = family_topo(fam, args.scales, cells)
    scaling = (SCALING if fmt == "uvp"
               else {k: v for k, v in SCALING.items() if k != "p"})
    scale_ns = gfd.transforms.ScaleNs(scaling, format=fmt)
    train_sample = Compose(
        [scale_ns]
        + ([gfd.transforms.AddUniformNoise(args.noise, seed=1)]
           if args.noise > 0 else []))
    n_out_max = args.nmax
    train_ds = TaylorGreenNs(args.sims, args.n_nodes, n_out_max, topo,
                             train_sample, seed=1, dt=args.dt, fmt=fmt)
    val_ds = TaylorGreenNs(4, args.n_nodes, n_out_max, topo, scale_ns,
                           seed=99, dt=args.dt, fmt=fmt)

    # identity (frozen-field) 1-step baseline in scaled units → tolerance.
    # Must use the SAME composition as the training loss (MSE + λ_d·L1 on
    # Dirichlet nodes): the L1 term dominates at identity (~σ·λ_d vs σ²),
    # so an MSE-only tolerance is ~50x too strict and the curriculum
    # would never advance past n_out=1.
    g0 = val_ds.graph_at(0, 0, 1)
    err = np.asarray(g0.field) - np.asarray(g0.target)
    ident_mse = float(np.mean(err ** 2))
    dir_rows = np.asarray(g0.omega)[:, 0] == 1
    ident_l1 = float(np.abs(err[dir_rows]).mean()) if dir_rows.any() else 0.0
    ident = ident_mse + 0.25 * ident_l1
    tolerance = args.tolerance_frac * ident
    print(f"identity 1-step loss {ident:.3e} (mse {ident_mse:.3e} + "
          f"0.25*L1 {ident_l1:.3e}) -> tolerance {tolerance:.3e}",
          file=sys.stderr)

    name = f"taylor_green{args.tag}"
    chk = f"./{name}.chk"
    cfg = gfd.nn.TrainConfig(
        name=name, folder=".", tensor_board=None, chk_interval=10,
        checkpoint=chk if args.resume else None,
        training_loss=gfd.nn.GraphLoss(lambda_d=0.25),
        validation_loss=gfd.nn.GraphLoss(lambda_d=0.25),
        epochs=args.epochs,
        num_steps=([int(s) for s in args.stages.split(",")] if args.stages
                   else [n for n in (1, 2, 4, 6, 8, 10) if n <= args.nmax]),
        add_steps={"tolerance": tolerance, "loss": "training"},
        batch_size=4 if fam == "remus" else 8,
        lr=args.lr, grad_clip={"epoch": 0, "limit": 1},
        scheduler={"factor": 0.5, "patience": args.patience,
                   "loss": "training"},
        stopping=1e-8, mixed_precision=not args.cpu)
    model = getattr(gfd.nn, model_cls_name)(
        arch=arch, scan_layers=True,
        compute_dtype=jnp.bfloat16 if not args.cpu else jnp.float32)
    print(f"params: {model.num_params}", file=sys.stderr)
    t0 = time.time()
    if args.eval_only:
        model.load_model(checkpoint=chk)
        model.compute_dtype = jnp.bfloat16 if not args.cpu else jnp.float32
    else:
        if args.init_from:
            model.load_model(checkpoint=args.init_from)
            print(f"warm-started weights from {args.init_from}",
                  file=sys.stderr)
        # multi-scale: node_bucket must NOT be the full 8192 (it pads every
        # coarse level to it too); 512 keeps L1 exact (8×1024 is a
        # multiple) and coarse levels tight.  edge_bucket 4096 absorbs the
        # coarse-edge-count variance (measured 5.9-6.6k for L2 at batch 8)
        # into ONE compiled shape instead of straddling a 1024/2048
        # boundary every few batches (remote compiles are minutes each).
        nb, eb = ((1024 * 8, 1024) if fam == "mus" and args.scales == 1
                  else (512, 4096))
        bs = 4 if fam == "remus" else 8   # reference REMuS batch size
        train_loader = DataLoader(train_ds, batch_size=bs, shuffle=True,
                                  node_bucket=nb, edge_bucket=eb)
        val_loader = DataLoader(val_ds, batch_size=4, node_bucket=nb,
                                edge_bucket=eb)
        model.fit(cfg, train_loader, val_loader)
    train_time = time.time() - t0
    if args.eval_f32:
        model.compute_dtype = jnp.float32

    # ---- long-horizon rollout vs analytic truth (scaled space) ------------
    # train_time_s is CUMULATIVE over resume segments (an eval-only pass
    # adds ~0 but keeps the accumulated total), so the capability JSON
    # reports the real cost of the checkpoint, not the last segment's.
    prev_time = 0.0
    if args.resume or args.eval_only:
        try:
            with open(f"{name}_results.json") as f:
                prev_time = float(json.load(f).get("train_time_s", 0.0))
        except (OSError, ValueError):
            pass
    n_roll = args.rollout
    results = {"train_time_s": round(prev_time + train_time, 1),
               "rollout_steps": n_roll}
    rmses = []
    for sim in range(4):
        g = val_ds.graph_at(sim, 0, n_roll)
        batch = collate([g], node_bucket=64, edge_bucket=128).to_device()
        pred = np.asarray(model.solve(batch, n_out=n_roll))
        target = np.asarray(batch.target)
        mask = np.asarray(batch.node_mask)
        rmses.append(rollout_rmse(pred, target, node_mask=mask))
        if sim == 0:
            nrmse = rmses[0] / float(target[mask].std())
            results.update({
                "rollout_rmse": round(rmses[0], 5),
                "rollout_nrmse": round(nrmse, 4),
            })
            nf = val_ds.nf
            for s in (1, 10, 50, 100):
                if n_roll >= s:
                    sl = slice((s - 1) * nf, s * nf)
                    results[f"r2_step{s}"] = round(
                        r2(pred[mask, sl], target[mask, sl]), 4)
    results["rollout_rmse_mean4"] = round(float(np.mean(rmses)), 5)

    if fam == "remus":
        # rotation-equivariance of the TRAINED weights: rotate the model's
        # own inputs (scaled field + point cloud) and rebuild the REMuS
        # topology — outputs must co-rotate (tests/test_models.py:195
        # asserts this for random weights; here for the converged ones)
        from graphs4cfd_tpu.graph import Graph
        theta = 117.0
        model.compute_dtype = jnp.float32
        pos0, prm, omega0 = val_ds.sims[0]

        def build(rot):
            g = Graph()
            g.pos = pos0
            g.glob = np.full((args.n_nodes, 1), val_ds.reynolds(0),
                             np.float32)
            g.field = tg_fields(pos0, 0.0, prm)[:, :2]
            g.target = g.field
            g.omega = omega0
            g.bound = np.ones(args.n_nodes, np.uint8)
            g = scale_ns(g)
            if rot:
                g = gfd.transforms.GraphRotation(theta, eq="ns",
                                                 format="uv")(g)
            g = family_topo(fam, args.scales, spatial_sort=False)(g)
            return collate([g], node_bucket=64, edge_bucket=128)

        b0 = build(False)
        valid = np.asarray(b0.node_mask)
        out_plain = np.asarray(model.forward(b0.to_device()))[valid]
        out_rot = np.asarray(model.forward(build(True).to_device()))[valid]
        th = np.deg2rad(theta)
        R = np.array([[np.cos(th), np.sin(th)],
                      [-np.sin(th), np.cos(th)]])
        eq_err = float(np.abs(out_rot - out_plain @ R).max())
        results["equivariance_max_err"] = round(eq_err, 6)

    print(json.dumps(results))
    with open(f"{name}_results.json", "w") as f:
        json.dump(results, f, indent=1)

    if args.pin_fixture:
        import shutil
        fixdir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "fixtures")
        os.makedirs(fixdir, exist_ok=True)
        shutil.copy(chk, os.path.join(fixdir, f"{name}_model.chk"))
        pins = {
            "n_nodes": args.n_nodes, "dt": args.dt,
            "model_cls": model_cls_name,
            "family": fam, "scales": args.scales,
            "cells": cells,
            "r2_step50_min": round(results.get("r2_step50", 0.0) - 0.1, 4),
            "r2_step100_min": round(results.get("r2_step100", 0.0) - 0.1,
                                    4),
            "rollout_rmse_max": round(results["rollout_rmse"] * 1.3, 5),
        }
        with open(os.path.join(fixdir, f"{name}_pins.json"), "w") as f:
            json.dump(pins, f, indent=1)
        print("pinned fixture:", pins)


if __name__ == "__main__":
    main()
