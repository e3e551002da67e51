"""Inference example: MuS-GNN rollout on the advection dataset.

Script equivalent of the reference's ``inference/mus_gnn/adv_mus_gnn.ipynb``.
"""
import numpy as np

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose
from graphs4cfd_tpu.loader import collate
from graphs4cfd_tpu.metrics import r2, rollout_rmse

model = gfd.nn.AdvThreeScaleGNN(checkpoint="AdvThreeScaleGNN.chk")

path = "<Path to dataset UniformAdv_xPeriodic_yPeriodic.h5>"
n_out = 45
transform = Compose([
    gfd.transforms.ConnectKNN(6, period=(1, 1)),
    gfd.transforms.ScaleEdgeAttr(0.01),
    gfd.transforms.GridClustering([0.02, 0.04]),
])
dataset = gfd.datasets.Adv(path=path, transform=transform)
graph = dataset.get_sequence(0, sequence_start=0, n_in=1, n_out=n_out,
                             step=2)
batch = collate([graph]).to_device()

pred = np.asarray(model.solve(batch, n_out=n_out))
target = np.asarray(batch.target)
mask = np.asarray(batch.node_mask)
print(f"rollout RMSE ({n_out} steps): "
      f"{rollout_rmse(pred, target, node_mask=mask):.4e}")
print(f"r2 full rollout: {r2(pred[mask], target[mask]):.4f}")

pos = np.asarray(batch.pos)[mask]
frames = [0, n_out // 2, n_out - 1]
gfd.plot.compare_fields(pos, target[mask][:, frames], pred[mask][:, frames],
                        file="adv_mus_rollout.png", show=False)
print("wrote adv_mus_rollout.png")
