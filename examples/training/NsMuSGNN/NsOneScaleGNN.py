"""Training script for the NsOneScaleGNN model on the NsCircle dataset
(the 1S-GNN in Lino et al. 2022, https://doi.org/10.1063/5.0097679).

TPU-native port of the reference script
/root/reference/examples/training/NsMuSGNN/NsOneScaleGNN.py.
"""

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose, random_split

# Training configuration
train_config = gfd.nn.TrainConfig(
    name            = 'NsOneScaleGNN',
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
    mixed_precision = True,  # bf16 matmuls/activations on TPU
)

# Training datasets
path = "<Path to dataset NsCircle.h5>"  # https://doi.org/10.5281/zenodo.7870707
transform = Compose([
    gfd.transforms.SpatialSort(),      # Morton order: fast TPU gather path
    gfd.transforms.ConnectKNN(6, period=[None, "auto"]),
    gfd.transforms.ScaleNs({'u': (-2.1, 2.6), 'v': (-2.25, 2.1),
                            'p': (-3.7, 2.35), 'Re': (500, 1000)},
                           format='uvp'),
    gfd.transforms.ScaleEdgeAttr(0.1),
    gfd.transforms.RandomGraphRotation(eq='ns', format='uvp'),
    gfd.transforms.RandomGraphFlip(eq='ns', format='uvp'),
    gfd.transforms.AddUniformNoise(0.01),
])
dataset = gfd.datasets.NsCircle(
    format='uvp', path=path,
    training_info={"n_in": 1, "n_out": train_config['num_steps'][-1],
                   "step": 1, "T": 100},
    transform=transform)
train_set, test_set = random_split(dataset, [1000, 32])
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
    "node_encoder": (5, (128,128,128), False),
    # Level 1
    "mp11": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp12": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp13": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp14": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp15": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp16": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp17": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "mp18": ((128+2*128, (128,128,128), True), (128+128, (128,128,128), True)),
    "decoder": (128, (128,128,3), False),
}
model = gfd.nn.NsOneScaleGNN(arch=arch)
print("Number of trainable parameters: ", model.num_params)

# Training
model.fit(train_config, train_loader, val_loader=val_loader)
