"""Training script for the AdvFourScaleGNN model on the advection datasets
(the 4S-GNN in Lino et al. 2022, https://doi.org/10.1063/5.0097679).

TPU-native port of the reference script
/root/reference/examples/training/AdvMuSGNN/AdvFourScaleGNN.py.
"""

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose, random_split, ConcatDataset

# Training configuration
train_config = gfd.nn.TrainConfig(
    name            = 'AdvFourScaleGNN',
    folder          = '.',
    tensor_board    = '.',
    chk_interval    = 1,
    training_loss   = gfd.nn.GraphLoss(lambda_d=0.25),
    validation_loss = gfd.nn.GraphLoss(),
    epochs          = 500,
    num_steps       = [i for i in range(1, 11)],
    add_steps       = {'tolerance': 0.01, 'loss': 'training'},
    batch_size      = 8,
    lr              = 1e-4,
    grad_clip       = {"epoch": 0, "limit": 1},
    scheduler       = {"factor": 0.5, "patience": 5, "loss": 'training'},
    stopping        = 1e-8,
    mixed_precision = True,
)

# Training datasets (https://doi.org/10.5281/zenodo.7861710)
path1 = "<Path to dataset UniformAdv_xPeriodic_yPeriodic.h5>"
path2 = "<Path to dataset UniformAdv_yPeriodic.h5>"
common = [
    gfd.transforms.ScaleEdgeAttr(0.01),
    gfd.transforms.RandomGraphRotation(eq='adv'),
    gfd.transforms.RandomGraphFlip(eq='adv'),
    gfd.transforms.AddUniformNoise(0.01),
    gfd.transforms.GridClustering([0.02, 0.04, 0.08]),
]
sort = gfd.transforms.SpatialSort()    # Morton order: fast TPU gather path
transform1 = Compose([sort, gfd.transforms.ConnectKNN(6, period=(1, 1))]
                     + common)
transform2 = Compose([sort, gfd.transforms.ConnectKNN(6, period=(None, 0.5))]
                     + common)
info = {"n_in": 1, "n_out": 10, "step": 2, "T": 100}
dataset1 = gfd.datasets.Adv(path=path1, training_info=info,
                            transform=transform1)
dataset2 = gfd.datasets.Adv(path=path2, training_info=info,
                            transform=transform2)
train_set1, test_set1 = random_split(dataset1, [1490, 10])
train_set2, test_set2 = random_split(dataset2, [2990, 10])
train_set = ConcatDataset([train_set1, train_set2])
test_set = ConcatDataset([test_set1, test_set2])
train_loader = gfd.DataLoader(train_set,
                              batch_size=train_config['batch_size'],
                              shuffle=True)
val_loader = gfd.DataLoader(test_set,
                            batch_size=train_config['batch_size'],
                            shuffle=False)

# Model definition
arch = {
    ################ Edge-functions ################## Node-functions ##############
    # Encoder
    "edge_encoder": (2, (128,128,128), False),
    "node_encoder": (4, (128,128,128), False),
    # Level 1
    "mp111": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp112": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "down_mp12": (2+128, (128,128,128), True),
    # Level 2
    "mp211": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp212": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "down_mp23": (2+128, (128,128,128), True),
    # Level 3
    "mp311": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp312": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "down_mp34": (2+128, (128,128,128), True),
    # Level 4
    "mp41": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp42": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp43": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp44": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "up_mp43": (2+128+128, (128,128,128), True),
    # Level 3
    "mp321": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp322": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "up_mp32": (2+128+128, (128,128,128), True),
    # Level 2
    "mp221": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp222": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "up_mp21": (2+128+128, (128,128,128), True),
    # Level 1
    "mp121": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp122": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "decoder": (128, (128,128,1), False),
}
model = gfd.nn.AdvFourScaleGNN(arch=arch)
print("Number of trainable parameters: ", model.num_params)

# Training
model.fit(train_config, train_loader, val_loader=val_loader)
