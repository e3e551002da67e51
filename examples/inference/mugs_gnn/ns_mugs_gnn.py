"""Inference example: gMuS-GNN rollout on the NsCircle dataset.

Script equivalent of the reference's ``inference/mugs_gnn/ns_mugs_gnn.ipynb``.
"""
import numpy as np

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose
from graphs4cfd_tpu.loader import collate
from graphs4cfd_tpu.metrics import r2, rollout_rmse

model = gfd.nn.NsThreeGuillardScaleGNN(
    checkpoint="NsThreeGuillardScaleGNN.chk")

path = "<Path to dataset NsCircle.h5>"
n_out = 100
transform = Compose([
    gfd.transforms.GuillardCoarseningAndConnectKNN(
        k=(6, 6, 6), period=(None, "auto"),
        scale_edge_attr=(0.1, 0.25, 0.5)),
    gfd.transforms.ScaleNs({"u": (-2.1, 2.6), "v": (-2.25, 2.1),
                            "p": (-3.7, 2.35), "Re": (500, 1000)},
                           format='uvp'),
    gfd.transforms.BuildKnnInterpWeights(6),
])
dataset = gfd.datasets.NsCircle(format='uvp', path=path, transform=transform)
graph = dataset.get_sequence(0, sequence_start=0, n_in=1, n_out=n_out)
batch = collate([graph]).to_device()

pred = np.asarray(model.solve(batch, n_out=n_out))
target = np.asarray(batch.target)
mask = np.asarray(batch.node_mask)
print(f"rollout RMSE ({n_out} steps): "
      f"{rollout_rmse(pred, target, node_mask=mask):.4e}")
print(f"r2 full rollout: {r2(pred[mask], target[mask]):.4f}")

pos = np.asarray(batch.pos)[mask]
bound = np.asarray(batch.bound)[mask]
frames = [3 * t for t in (0, 49, 99)]
gfd.plot.compare_fields(pos, target[mask][:, frames], pred[mask][:, frames],
                        bound=bound, file="ns_mugs_rollout.png", show=False)
print("wrote ns_mugs_rollout.png")
