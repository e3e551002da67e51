"""End-to-end reference-checkpoint conversion (VERDICT r1 item 9).

A PyTorch module assembled exactly like the reference's (block attributes
holding ``MLP``/``GNBlock`` submodules, so ``state_dict()`` keys follow
``<block>.<sub?>.MLP.linear_i.{weight,bias}`` —
``/root/reference/graphs4cfd/nn/blocks.py:117-190``) is saved in the
reference ``.chk`` schema (``model.py:338-345``), converted with
``convert_reference_checkpoint``, loaded via ``GNN(checkpoint=...)`` and
must produce the same forward as the torch oracle.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import graphs4cfd_tpu as g4c
from graphs4cfd_tpu.graph import Graph
from graphs4cfd_tpu import transforms as T
from graphs4cfd_tpu.loader import collate
from graphs4cfd_tpu.training.checkpoint import convert_reference_checkpoint

from oracle_torch import MLP as TorchMLP, GNBlock as TorchGNBlock

W = 16


class RefOneScale(torch.nn.Module):
    """Reference-style 1-scale MuS model (mus_gnn.py:566-636 shape)."""

    def __init__(self, arch):
        super().__init__()
        self.edge_encoder = TorchMLP(*arch["edge_encoder"])
        self.node_encoder = TorchMLP(*arch["node_encoder"])
        self.mp111 = TorchGNBlock(*arch["mp111"])
        self.decoder = TorchMLP(*arch["decoder"])

    def forward(self, x, e_attr, senders, receivers, field, nf):
        v = torch.selu(self.node_encoder(x))
        e = torch.selu(self.edge_encoder(e_attr))
        v, e = self.mp111(v, e, senders, receivers)
        v, e = torch.selu(v), torch.selu(e)
        out = self.decoder(v)
        return field[:, -nf:] + out


def test_convert_reference_checkpoint_forward_parity(tmp_path):
    arch = {
        "edge_encoder": (2, (W, W), False),
        "node_encoder": (5, (W, W), False),
        "mp111": ((W + 2 * W, (W, W), True), (W + W, (W, W), True)),
        "decoder": (W, (W, 1), False),
    }
    torch.manual_seed(0)
    ref = RefOneScale(arch)

    # the reference checkpoint schema (model.py:338-345)
    src = tmp_path / "ref.chk"
    torch.save({"arch": arch, "weights": ref.state_dict(),
                "optimiser": None, "n_out": 3, "lr": 5e-5, "epoch": 17},
               str(src))

    dst = tmp_path / "converted.chk"
    out = convert_reference_checkpoint(str(src), str(dst))
    assert set(out["arch"]) == set(arch)

    # self-describing load: arch comes from inside the checkpoint
    model = g4c.nn.MuSGNN(checkpoint=str(dst))

    rng = np.random.default_rng(3)
    g = Graph()
    g.pos = rng.random((60, 2)).astype(np.float32)
    g.loc = rng.normal(size=(60, 2)).astype(np.float32)
    g.field = rng.normal(size=(60, 2)).astype(np.float32)
    g.omega = (rng.random((60, 1)) < 0.2).astype(np.float32)
    g.bound = np.zeros(60, np.uint8)
    g = T.ConnectKNN(k=4)(g)
    g = T.ScaleEdgeAttr(0.05)(g)
    batch = collate([g], node_bucket=1, edge_bucket=1)

    pred = np.asarray(model.forward(batch.to_device()))

    x = np.concatenate([np.asarray(batch.field), np.asarray(batch.loc),
                        np.asarray(batch.omega)], axis=1)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(np.asarray(batch.edge_attr)),
                      torch.tensor(np.asarray(batch.senders), dtype=torch.long),
                      torch.tensor(np.asarray(batch.receivers), dtype=torch.long),
                      torch.tensor(np.asarray(batch.field)), 1).numpy()
    np.testing.assert_allclose(pred, ref_out, rtol=2e-5, atol=2e-5)
