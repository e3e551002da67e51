"""Inference example: MuS-GNN rollout on the NsCircle dataset.

Script equivalent of the reference's ``inference/mus_gnn/ns_mus_gnn.ipynb``
(a Git-LFS stub in the reference checkout): load a trained model, roll out
100 steps on a held-out simulation and compare against ground truth.
"""
import numpy as np

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose
from graphs4cfd_tpu.loader import collate
from graphs4cfd_tpu.metrics import r2, rollout_rmse

# ---- model ----------------------------------------------------------------
# Either a bundled pretrained name (see graphs4cfd_tpu/nn/weights/README.md)
# or a checkpoint produced by a training script:
# model = gfd.nn.NsThreeScaleGNN(model="3S-GNN-NsCircle-v1")
model = gfd.nn.NsThreeScaleGNN(checkpoint="NsThreeScaleGNN.chk")

# ---- data -----------------------------------------------------------------
path = "<Path to dataset NsCircle.h5>"  # https://doi.org/10.5281/zenodo.7870707
n_out = 100
transform = Compose([
    gfd.transforms.ConnectKNN(6, period=[None, "auto"]),
    gfd.transforms.ScaleNs({'u': (-2.1, 2.6), 'v': (-2.25, 2.1),
                            'p': (-3.7, 2.35), 'Re': (500, 1000)},
                           format='uvp'),
    gfd.transforms.ScaleEdgeAttr(0.1),
    gfd.transforms.GridClustering([0.15, 0.30]),
])
dataset = gfd.datasets.NsCircle(format='uvp', path=path, transform=transform)
graph = dataset.get_sequence(0, sequence_start=0, n_in=1, n_out=n_out)
batch = collate([graph]).to_device()

# ---- rollout --------------------------------------------------------------
pred = np.asarray(model.solve(batch, n_out=n_out))
target = np.asarray(batch.target)
mask = np.asarray(batch.node_mask)

print(f"rollout RMSE ({n_out} steps): "
      f"{rollout_rmse(pred, target, node_mask=mask):.4e}")
for t in (0, 9, 49, 99):
    print(f"  r2(u, t={t + 1}): "
          f"{r2(pred[mask, 3 * t], target[mask, 3 * t]):.4f}")

# ---- visual comparison (plot.py:233-319 equivalent) -----------------------
pos = np.asarray(batch.pos)[mask]
bound = np.asarray(batch.bound)[mask]
frames = [3 * t for t in (0, 49, 99)]  # u at t=1, 50, 100
gfd.plot.compare_fields(pos, target[mask][:, frames], pred[mask][:, frames],
                        bound=bound, file="ns_mus_rollout.png", show=False)
print("wrote ns_mus_rollout.png")
