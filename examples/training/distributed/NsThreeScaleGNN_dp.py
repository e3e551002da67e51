"""Distributed training of NsThreeScaleGNN on a TPU device mesh.

Framework-native example (no reference counterpart — the reference is
single-device).  TrainConfig drives the mesh directly:

* ``devices=N``        data parallelism — each batch is sharded N ways,
                       trained under shard_map with the exact global
                       loss/gradients (psum of per-term sums);
* ``graph_devices=N``  graph parallelism — each batch graph is ONE giant
                       mesh, edge-partitioned with halo all_to_all
                       exchange per MP layer (scales |V|, |E| past one
                       chip's memory).
* both together        DP x GP over a 2-axis mesh (batch groups on
                       ``data`` x edge partition on ``graph``), loss
                       psum'd over both axes — the pod topology where DP
                       rides DCN and halo exchange stays on ICI.

Run on a pod slice after ``gfd.parallel.initialize_distributed()``; for a
smoke test on CPU:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python \
      examples/training/distributed/NsThreeScaleGNN_dp.py --cpu
"""
import sys

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose, random_split

gfd.parallel.initialize_distributed()   # no-op off-pod

train_config = gfd.nn.TrainConfig(
    name            = 'NsThreeScaleGNN_dp',
    folder          = '.',
    tensor_board    = '.',
    chk_interval    = 1,
    training_loss   = gfd.nn.GraphLoss(lambda_d=0.25),
    validation_loss = gfd.nn.GraphLoss(),
    epochs          = 500,
    num_steps       = [i for i in range(1, 11)],
    add_steps       = {'tolerance': 0.005, 'loss': 'training'},
    batch_size      = 8,
    lr              = 1e-5,
    grad_clip       = {"epoch": 0, "limit": 1},
    scheduler       = {"factor": 0.5, "patience": 5, "loss": 'training'},
    stopping        = 1e-8,
    mixed_precision = True,
    devices         = 8,      # DP over 8 chips; batch_size % devices == 0
    # graph_devices = 8,      # alternative: partition ONE giant mesh
    # devices=2, graph_devices=4,   # or compose both on a 2x4 mesh
)

path = "<Path to dataset NsCircle.h5>"  # https://doi.org/10.5281/zenodo.7870707
transform = Compose([
    gfd.transforms.SpatialSort(),
    gfd.transforms.ConnectKNN(6, period=[None, "auto"]),
    gfd.transforms.ScaleNs({'u': (-2.1, 2.6), 'v': (-2.25, 2.1),
                            'p': (-3.7, 2.35), 'Re': (500, 1000)},
                           format='uvp'),
    gfd.transforms.ScaleEdgeAttr(0.1),
    gfd.transforms.RandomGraphRotation(eq='ns', format='uvp'),
    gfd.transforms.RandomGraphFlip(eq='ns', format='uvp'),
    gfd.transforms.AddUniformNoise(0.01),
    gfd.transforms.GridClustering([0.15, 0.30]),
])
dataset = gfd.datasets.NsCircle(
    format='uvp', path=path,
    training_info={"n_in": 1, "n_out": train_config['num_steps'][-1],
                   "step": 1, "T": 100},
    transform=transform)
train_set, test_set = random_split(dataset, [1000, 32])
# fit() sets loader.num_shards = devices automatically
train_loader = gfd.DataLoader(train_set,
                              batch_size=train_config['batch_size'],
                              shuffle=True)
val_loader = gfd.DataLoader(test_set,
                            batch_size=train_config['batch_size'],
                            shuffle=False)

MP = ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True))
arch = {
    "edge_encoder": (2, (128,128,128), False),
    "node_encoder": (5, (128,128,128), False),
    "mp111": MP, "mp112": MP, "mp113": MP, "mp114": MP,
    "down_mp12": (2+128, (128,128,128), True),
    "mp211": MP, "mp212": MP,
    "down_mp23": (2+128, (128,128,128), True),
    "mp31": MP, "mp32": MP, "mp33": MP, "mp34": MP,
    "up_mp32": (2+128+128, (128,128,128), True),
    "mp221": MP, "mp222": MP,
    "up_mp21": (2+128+128, (128,128,128), True),
    "mp121": MP, "mp122": MP, "mp123": MP, "mp124": MP,
    "decoder": (128, (128,128,3), False),
}
model = gfd.nn.NsThreeScaleGNN(arch=arch)
print("Number of trainable parameters: ", model.num_params)

model.fit(train_config, train_loader, val_loader=val_loader)
