"""Torch-only oracle re-deriving the reference block semantics.

PyG isn't installed, so these re-create the reference's computations
(``/root/reference/graphs4cfd/nn/blocks.py``) with plain torch: scatter-mean
via ``index_add_`` + bincount, coalesce via numpy unique.  Used purely as a
numeric oracle for parity tests — keep faithful to reference *semantics*,
not to this framework's layout.
"""
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


class MLP(nn.Module):
    """Reference MLP (blocks.py:117-144): Linear/SELU stack + opt LayerNorm,
    with the reference's module naming so state_dicts round-trip."""

    def __init__(self, input_size, layers_width, layer_norm=False):
        super().__init__()
        self.MLP = nn.Sequential()
        self.MLP.add_module("linear_1", nn.Linear(input_size, layers_width[0]))
        self.MLP.add_module("selu_1", nn.SELU())
        for i in range(len(layers_width) - 2):
            self.MLP.add_module(f"linear_{i+2}",
                                nn.Linear(layers_width[i], layers_width[i+1]))
            self.MLP.add_module(f"selu_{i+2}", nn.SELU())
        self.MLP.add_module(f"linear_{len(layers_width)}",
                            nn.Linear(layers_width[-2], layers_width[-1]))
        if layer_norm:
            self.MLP.add_module("layer_norm", nn.LayerNorm(layers_width[-1]))

    def forward(self, x):
        return self.MLP(x)


def scatter_mean(src, index, dim_size):
    out = torch.zeros(dim_size, src.shape[1], dtype=src.dtype)
    out.index_add_(0, index, src)
    count = torch.bincount(index, minlength=dim_size).clamp(min=1)
    return out / count[:, None].to(src.dtype)


class GNBlock(nn.Module):
    """Reference GNBlock (blocks.py:147-186)."""

    def __init__(self, edge_mlp_args, node_mlp_args):
        super().__init__()
        self.edge_mlp = MLP(*edge_mlp_args)
        self.node_mlp = MLP(*node_mlp_args)

    def forward(self, v, e, senders, receivers):
        e = self.edge_mlp(torch.cat((e, v[senders], v[receivers]), dim=-1))
        aggr = scatter_mean(e, receivers, v.shape[0])
        v = self.node_mlp(torch.cat((aggr, v), dim=-1))
        return v, e


def pool_edge_ref(parent, senders, receivers, edge_attr):
    """Reference pool_edge (blocks.py:51-68) with numpy coalesce."""
    cs = parent[senders]
    cr = parent[receivers]
    keep = cs != cr
    cs, cr, attr = cs[keep], cr[keep], edge_attr[keep]
    denom = int(parent.max()) + 1
    key = cr.astype(np.int64) * denom + cs
    uniq, inverse = np.unique(key, return_inverse=True)
    out = np.zeros((len(uniq), attr.shape[1]), dtype=np.float64)
    np.add.at(out, inverse, attr)
    counts = np.bincount(inverse, minlength=len(uniq))
    out /= counts[:, None]
    new_s = (uniq % denom).astype(np.int64)
    new_r = (uniq // denom).astype(np.int64)
    return new_s, new_r, out.astype(np.float32)


class EdgeMP(nn.Module):
    """Reference EdgeMP (blocks.py:293-333) on flat angle lists."""

    def __init__(self, angle_mlp_args, edge_mlp_args):
        super().__init__()
        self.angle_mlp = MLP(*angle_mlp_args)
        self.edge_mlp = MLP(*edge_mlp_args)

    def forward(self, e, a, angle_row, angle_col):
        a = self.angle_mlp(torch.cat((a, e[angle_row], e[angle_col]), dim=1))
        aggr = scatter_mean(a, angle_col, e.shape[0])
        e = self.edge_mlp(torch.cat((aggr, e), dim=1))
        return e, a
