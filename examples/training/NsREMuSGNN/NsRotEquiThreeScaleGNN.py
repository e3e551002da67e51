"""Training script for the NsRotEquiThreeScaleGNN (REMuS-GNN) model on the
NsEllipse dataset (Lino et al. 2022, https://doi.org/10.1063/5.0097679).

TPU-native port of the reference script
/root/reference/examples/training/NsREMuSGNN/NsRotEquiTreeScaleGNN.py.
"""

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose

# Training configuration
train_config = gfd.nn.TrainConfig(
    name            = 'NsRotEquiThreeScaleGNN',
    folder          = '.',
    tensor_board    = '.',
    chk_interval    = 1,
    training_loss   = gfd.nn.GraphLoss(lambda_d=0.25),
    validation_loss = gfd.nn.GraphLoss(),
    epochs          = 500,
    num_steps       = [i for i in range(1, 11)],
    add_steps       = {'tolerance': 0.002, 'loss': 'training'},
    batch_size      = 4,
    lr              = 1e-5,
    grad_clip       = {"epoch": 0, "limit": 1},
    scheduler       = {"factor": 0.5, "patience": 5, "loss": 'training'},
    stopping        = 1e-8,
    mixed_precision = True,
)

# Training dataset (https://doi.org/10.5281/zenodo.7892171)
path = "<Path to dataset NsEllipse.h5>"
transform = Compose([
    gfd.transforms.RandomNodeSubset(0.8),
    gfd.transforms.SpatialSort(),      # Morton order: fast TPU gather path
    gfd.transforms.ScaleNs({'u': (-1.8, 1.8), 'v': (-1.8, 1.8),
                            "Re": (500, 1000)}, format='uv'),
    gfd.transforms.BuildRemusGraph(num_levels=3, k=5,
                                   scale_edge_length=(0.1, 0.2, 0.4)),
    gfd.transforms.BuildKnnInterpWeights(5),
    gfd.transforms.AddUniformNoise(0.01),
])
train_set = gfd.datasets.NsEllipse(
    format='uv', path=path,
    training_info={"n_in": 1, "n_out": 10, "step": 1, "T": 101},
    transform=transform)
train_loader = gfd.DataLoader(train_set,
                              batch_size=train_config['batch_size'],
                              shuffle=True)

# Model definition
arch = {
    ################ Angle-functions ################## Edge-functions ##############
    # Encoder
    "angle_encoder"  : (4, (128,128), True),
    "angle_encoder12": (4, (128,128), True),
    "angle_encoder2" : (4, (128,128), True),
    "angle_encoder23": (4, (128,128), True),
    "angle_encoder3" : (4, (128,128), True),
    "edge_encoder"   : (3, (128,128), True),
    "edge_encoder2"  : (3, (128,128), True),
    "edge_encoder3"  : (3, (128,128), True),
    # Level 1
    "mp111":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp112":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp113":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp114":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    # Pooling 1->2
    "down_mp12":   ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    # Level 2
    "mp211":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp212":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    # Pooling 2->3
    "down_mp23":   ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    # Level 3
    "mp31":     ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp32":     ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp33":     ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp34":     ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    # Unpooling 3->2
    "up_mp32": (128+128,   (128,128,128), True),
    # Level 2
    "mp221":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp222":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    # Unpooling 2->1
    "up_mp21": (128+128,   (128,128,128), True),
    # Level 1
    "mp121":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp122":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp123":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    "mp124":    ((128+2*128, (128,128), True), (128+128, (128,128), True)),
    # Decoder
    "decoder": (128, (128,1), False),
}
model = gfd.nn.NsRotEquiThreeScaleGNN(arch=arch)
print("Number of trainable parameters: ", model.num_params)

# Training
model.fit(train_config, train_loader)
