"""Full-train-step parity vs a torch oracle (SURVEY §4 item 2).

Builds the same tiny 1-scale model in torch (oracle blocks) and in this
framework (weights imported), then runs the reference training inner loop —
per rollout step t: forward, MSE loss, backward, global-norm clip, Adam
step, field shift with detached feedback (``model.py:226-254``) — and
asserts losses and updated parameters match.
"""
import numpy as np
import torch
import jax
import jax.numpy as jnp

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu import ops
from graphs4cfd_tpu.graph import Graph
from graphs4cfd_tpu.loader import collate
from graphs4cfd_tpu.nn.losses import GraphLoss
from graphs4cfd_tpu.training.trainer import make_train_step, _adam_opt
from graphs4cfd_tpu.training.checkpoint import import_torch_state_dict

from oracle_torch import MLP as TorchMLP, GNBlock as TorchGNBlock

W = 16
torch.manual_seed(0)


class TorchOneScale(torch.nn.Module):
    """Reference AdvOneScaleGNN-shaped oracle (mus_gnn.py:566-636)."""

    def __init__(self, n_node_in, nf):
        super().__init__()
        self.edge_encoder = TorchMLP(2, (W, W), False)
        self.node_encoder = TorchMLP(n_node_in, (W, W), False)
        self.mp111 = TorchGNBlock((3 * W, (W, W), True), (2 * W, (W, W), True))
        self.mp112 = TorchGNBlock((3 * W, (W, W), True), (2 * W, (W, W), True))
        self.node_decoder = TorchMLP(W, (W, nf), False)
        self.nf = nf

    def forward(self, field, loc, omega, edge_attr, senders, receivers):
        x = torch.cat([field, loc, omega], dim=1)
        e = torch.nn.functional.selu(self.edge_encoder(edge_attr))
        v = torch.nn.functional.selu(self.node_encoder(x))
        v, e = self.mp111(v, e, senders, receivers)
        v, e = torch.nn.functional.selu(v), torch.nn.functional.selu(e)
        v, _ = self.mp112(v, e, senders, receivers)
        v = torch.nn.functional.selu(v)
        out = self.node_decoder(v)
        return field[:, -self.nf:] + out


def test_full_train_step_parity(rng):
    n, k, nf, n_in = 50, 4, 1, 2
    pos = rng.random((n, 2)).astype(np.float32)
    s, r, attr = ops.connect_knn(pos, k)
    field = rng.normal(size=(n, nf * n_in)).astype(np.float32)
    loc = rng.normal(size=(n, 2)).astype(np.float32)
    omega = np.zeros((n, 1), np.float32)
    target = rng.normal(size=(n, nf * 3)).astype(np.float32)

    # ---- torch oracle: reference fit inner loop ---------------------------
    tm = TorchOneScale(nf * n_in + 3, nf)
    sd0 = {kk: v.detach().numpy().copy()
           for kk, v in tm.state_dict().items()}  # initial weights
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    t_field = torch.tensor(field)
    losses_ref = []
    n_out = 3
    for t in range(n_out):
        pred = tm(t_field, torch.tensor(loc), torch.tensor(omega),
                  torch.tensor(attr), torch.tensor(s, dtype=torch.long),
                  torch.tensor(r, dtype=torch.long))
        tgt = torch.tensor(target[:, nf * t:nf * (t + 1)])
        loss = torch.nn.functional.mse_loss(pred, tgt)
        loss.backward()
        losses_ref.append(float(loss))
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
        opt.step()
        opt.zero_grad()
        t_field = torch.cat([t_field[:, nf:], pred.detach()], dim=1)

    # ---- this framework: jitted multi-step train step ---------------------
    arch = {
        "edge_encoder": (2, (W, W), False),
        "node_encoder": (nf * n_in + 3, (W, W), False),
        "mp111": ((3 * W, (W, W), True), (2 * W, (W, W), True)),
        "mp112": ((3 * W, (W, W), True), (2 * W, (W, W), True)),
        "decoder": (W, (W, nf), False),
    }
    model = gfd.nn.AdvOneScaleGNN(arch=arch)
    sd = {kk.replace("node_decoder", "decoder"): v for kk, v in sd0.items()}
    params = import_torch_state_dict(sd)
    model.params = jax.tree_util.tree_map(
        lambda tmpl, w: jnp.asarray(w), model.params, params)

    g = Graph()
    g.pos, g.loc, g.field, g.omega = pos, loc, field, omega
    g.target = target
    g.bound = np.zeros(n, np.uint8)
    g.senders, g.receivers, g.edge_attr = s, r, attr
    g.fixed_k = k
    batch = collate([g], node_bucket=1, edge_bucket=1).to_device()

    step = make_train_step(model.apply, GraphLoss(), nf, n_out, 1.0)
    opt_state = _adam_opt().init(model.params)
    new_params, opt_state, loss_mean, gnorm = step(
        model.params, opt_state, batch, jnp.float32(1e-3), jnp.bool_(True))

    # losses per t: reference mean
    np.testing.assert_allclose(float(loss_mean), np.mean(losses_ref),
                               rtol=2e-3, atol=2e-4)

    # parameters after 3 per-t Adam steps must match torch's
    sd_after = {kk: v.detach().numpy() for kk, v in tm.state_dict().items()}
    ref_params = import_torch_state_dict(sd_after)
    ref_params["decoder"] = ref_params.pop("node_decoder")
    for key in ("edge_encoder", "node_encoder", "mp111", "mp112", "decoder"):
        got = jax.tree_util.tree_leaves(new_params[key])
        ref = jax.tree_util.tree_leaves(ref_params[key])
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), b, rtol=5e-3,
                                       atol=5e-4)
