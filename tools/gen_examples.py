"""Generate the example training scripts (mirrors /root/reference/examples).

Run from the repo root: python tools/gen_examples.py
"""
import os

MP = "((128+2*128, (128,128,128), True), (128+128, (128,128,128), True))"
MPW = "((128+2*256, (128,128,128), True), (128+256, (128,128,128), True))"
DOWN = "(2+128, (128,128,128), True)"
UP = "(2+128+128, (128,128,128), True)"


def arch_lines(entries, node_in, dec_out):
    lines = ["arch = {",
             "    ################ Edge-functions ################## Node-functions ##############",
             "    # Encoder"]
    enc = [e for e in entries if e[0] == "enc"]
    if not enc:
        lines.append(f'    "edge_encoder": (2, (128,128,128), False),')
    else:
        for _, name in enc:
            lines.append(f'    "{name}": (2, (128,128,128), False),')
    lines.append(f'    "node_encoder": ({node_in}, (128,128,128), False),')
    for kind, name in entries:
        if kind == "enc":
            continue
        if kind == "mp":
            lines.append(f'    "{name}": {MP},')
        elif kind == "mpw":
            lines.append(f'    "{name}": {MPW},')
        elif kind == "down":
            lines.append(f'    "{name}": {DOWN},')
        elif kind == "up":
            lines.append(f'    "{name}": {UP},')
        elif kind == "lvl":
            lines.append(f"    # {name}")
    lines.append(f'    "decoder": (128, (128,128,{dec_out}), False),')
    lines.append("}")
    return "\n".join(lines)


def lv(n):
    return ("lvl", f"Level {n}")


NS_PLANS = {
    "NsOneScaleGNN": [lv(1)] + [("mp", f"mp1{i}") for i in range(1, 9)],
    "NsTwoScaleGNN": [lv(1), *[("mp", f"mp11{i}") for i in range(1, 5)],
                      ("down", "down_mp12"), lv(2),
                      *[("mp", f"mp2{i}") for i in range(1, 5)],
                      ("up", "up_mp21"), lv(1),
                      *[("mp", f"mp12{i}") for i in range(1, 5)]],
    "NsThreeScaleGNN": [lv(1), *[("mp", f"mp11{i}") for i in range(1, 5)],
                        ("down", "down_mp12"), lv(2),
                        ("mp", "mp211"), ("mp", "mp212"),
                        ("down", "down_mp23"), lv(3),
                        *[("mp", f"mp3{i}") for i in range(1, 5)],
                        ("up", "up_mp32"), lv(2),
                        ("mp", "mp221"), ("mp", "mp222"),
                        ("up", "up_mp21"), lv(1),
                        *[("mp", f"mp12{i}") for i in range(1, 5)]],
    "NsFourScaleGNN": [lv(1), *[("mp", f"mp11{i}") for i in range(1, 5)],
                       ("down", "down_mp12"), lv(2),
                       ("mp", "mp211"), ("mp", "mp212"),
                       ("down", "down_mp23"), lv(3),
                       ("mp", "mp311"), ("mp", "mp312"),
                       ("down", "down_mp34"), lv(4),
                       *[("mp", f"mp4{i}") for i in range(1, 5)],
                       ("up", "up_mp43"), lv(3),
                       ("mp", "mp321"), ("mp", "mp322"),
                       ("up", "up_mp32"), lv(2),
                       ("mp", "mp221"), ("mp", "mp222"),
                       ("up", "up_mp21"), lv(1),
                       *[("mp", f"mp12{i}") for i in range(1, 5)]],
}

ADV_PLANS = {
    "AdvOneScaleGNN": [lv(1), ("mp", "mp111"), ("mp", "mp112"),
                       ("mp", "mp121"), ("mp", "mp122")],
    "AdvTwoScaleGNN": [lv(1), ("mp", "mp111"), ("mp", "mp112"),
                       ("down", "down_mp12"), lv(2),
                       *[("mp", f"mp2{i}") for i in range(1, 5)],
                       ("up", "up_mp21"), lv(1),
                       ("mp", "mp121"), ("mp", "mp122")],
    "AdvThreeScaleGNN": [lv(1), ("mp", "mp111"), ("mp", "mp112"),
                         ("down", "down_mp12"), lv(2),
                         ("mp", "mp211"), ("mp", "mp212"),
                         ("down", "down_mp23"), lv(3),
                         *[("mp", f"mp3{i}") for i in range(1, 5)],
                         ("up", "up_mp32"), lv(2),
                         ("mp", "mp221"), ("mp", "mp222"),
                         ("up", "up_mp21"), lv(1),
                         ("mp", "mp121"), ("mp", "mp122")],
    "AdvFourScaleGNN": [lv(1), ("mp", "mp111"), ("mp", "mp112"),
                        ("down", "down_mp12"), lv(2),
                        ("mp", "mp211"), ("mp", "mp212"),
                        ("down", "down_mp23"), lv(3),
                        ("mp", "mp311"), ("mp", "mp312"),
                        ("down", "down_mp34"), lv(4),
                        *[("mp", f"mp4{i}") for i in range(1, 5)],
                        ("up", "up_mp43"), lv(3),
                        ("mp", "mp321"), ("mp", "mp322"),
                        ("up", "up_mp32"), lv(2),
                        ("mp", "mp221"), ("mp", "mp222"),
                        ("up", "up_mp21"), lv(1),
                        ("mp", "mp121"), ("mp", "mp122")],
}

MUGS_PLANS = {
    "NsTwoGuillardScaleGNN": (
        2, [lv(1), *[("mp", f"mp11{i}") for i in range(1, 5)], lv(2),
            *[("mp", f"mp2{i}") for i in range(1, 5)], lv(1),
            ("mpw", "mp121"), ("mp", "mp122"), ("mp", "mp123"),
            ("mp", "mp124")]),
    "NsThreeGuillardScaleGNN": (
        3, [lv(1), *[("mp", f"mp11{i}") for i in range(1, 5)], lv(2),
            ("mp", "mp211"), ("mp", "mp212"), lv(3),
            *[("mp", f"mp3{i}") for i in range(1, 5)], lv(2),
            ("mpw", "mp221"), ("mp", "mp222"), lv(1),
            ("mpw", "mp121"), ("mp", "mp122"), ("mp", "mp123"),
            ("mp", "mp124")]),
    "NsFourGuillardScaleGNN": (
        4, [lv(1), *[("mp", f"mp11{i}") for i in range(1, 5)], lv(2),
            ("mp", "mp211"), ("mp", "mp212"), lv(3),
            ("mp", "mp311"), ("mp", "mp312"), lv(4),
            *[("mp", f"mp4{i}") for i in range(1, 5)], lv(3),
            ("mpw", "mp321"), ("mp", "mp322"), lv(2),
            ("mpw", "mp221"), ("mp", "mp222"), lv(1),
            ("mpw", "mp121"), ("mp", "mp122"), ("mp", "mp123"),
            ("mp", "mp124")]),
}

NS_HEADER = '''"""Training script for the {cls} model on the NsCircle dataset
(the {short} in Lino et al. 2022, https://doi.org/10.1063/5.0097679).

TPU-native port of the reference script
/root/reference/examples/training/NsMuSGNN/{cls}.py.
"""

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose, random_split

# Training configuration
train_config = gfd.nn.TrainConfig(
    name            = '{cls}',
    folder          = '.',
    tensor_board    = '.',
    chk_interval    = 1,
    training_loss   = gfd.nn.GraphLoss(lambda_d=0.25),
    validation_loss = gfd.nn.GraphLoss(),
    epochs          = 500,
    num_steps       = [i for i in range(1, 11)],
    add_steps       = {{'tolerance': 0.005, 'loss': 'training'}},
    batch_size      = 8,
    lr              = 1e-5,
    grad_clip       = {{"epoch": 0, "limit": 1}},
    scheduler       = {{"factor": 0.5, "patience": 5, "loss": 'training'}},
    stopping        = 1e-8,
    mixed_precision = True,  # bf16 matmuls/activations on TPU
)

# Training datasets
path = "<Path to dataset NsCircle.h5>"  # https://doi.org/10.5281/zenodo.7870707
transform = Compose([
    gfd.transforms.SpatialSort(),      # Morton order: fast TPU gather path
    gfd.transforms.ConnectKNN(6, period=[None, "auto"]),
    gfd.transforms.ScaleNs({{'u': (-2.1, 2.6), 'v': (-2.25, 2.1),
                            'p': (-3.7, 2.35), 'Re': (500, 1000)}},
                           format='uvp'),
    gfd.transforms.ScaleEdgeAttr(0.1),
    gfd.transforms.RandomGraphRotation(eq='ns', format='uvp'),
    gfd.transforms.RandomGraphFlip(eq='ns', format='uvp'),
    gfd.transforms.AddUniformNoise(0.01),
    gfd.transforms.GridClustering([{cells}]),
])
dataset = gfd.datasets.NsCircle(
    format='uvp', path=path,
    training_info={{"n_in": 1, "n_out": train_config['num_steps'][-1],
                   "step": 1, "T": 100}},
    transform=transform)
train_set, test_set = random_split(dataset, [1000, 32])
train_loader = gfd.DataLoader(train_set,
                              batch_size=train_config['batch_size'],
                              shuffle=True)
val_loader = gfd.DataLoader(test_set,
                            batch_size=train_config['batch_size'],
                            shuffle=False)

# Model definition
{arch}
model = gfd.nn.{cls}(arch=arch)
print("Number of trainable parameters: ", model.num_params)

# Training
model.fit(train_config, train_loader, val_loader=val_loader)
'''

ADV_HEADER = '''"""Training script for the {cls} model on the advection datasets
(the {short} in Lino et al. 2022, https://doi.org/10.1063/5.0097679).

TPU-native port of the reference script
/root/reference/examples/training/AdvMuSGNN/{cls}.py.
"""

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose, random_split, ConcatDataset

# Training configuration
train_config = gfd.nn.TrainConfig(
    name            = '{cls}',
    folder          = '.',
    tensor_board    = '.',
    chk_interval    = 1,
    training_loss   = gfd.nn.GraphLoss(lambda_d=0.25),
    validation_loss = gfd.nn.GraphLoss(),
    epochs          = 500,
    num_steps       = [i for i in range(1, 11)],
    add_steps       = {{'tolerance': 0.01, 'loss': 'training'}},
    batch_size      = 8,
    lr              = 1e-4,
    grad_clip       = {{"epoch": 0, "limit": 1}},
    scheduler       = {{"factor": 0.5, "patience": 5, "loss": 'training'}},
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
    gfd.transforms.GridClustering([{cells}]),
]
sort = gfd.transforms.SpatialSort()    # Morton order: fast TPU gather path
transform1 = Compose([sort, gfd.transforms.ConnectKNN(6, period=(1, 1))]
                     + common)
transform2 = Compose([sort, gfd.transforms.ConnectKNN(6, period=(None, 0.5))]
                     + common)
info = {{"n_in": 1, "n_out": 10, "step": 2, "T": 100}}
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
{arch}
model = gfd.nn.{cls}(arch=arch)
print("Number of trainable parameters: ", model.num_params)

# Training
model.fit(train_config, train_loader, val_loader=val_loader)
'''

MUGS_HEADER = '''"""Training script for the {cls} model on the NsCircle dataset
(the {short} in Lino et al. 2022, https://doi.org/10.1063/5.0097679;
low-resolution graphs from Guillard's node-nested coarsening).

TPU-native port of the reference script
/root/reference/examples/training/NsMuGSGNN/{refname}.py.
"""

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose, random_split

# Training configuration
train_config = gfd.nn.TrainConfig(
    name            = '{cls}',
    folder          = '.',
    tensor_board    = '.',
    chk_interval    = 1,
    training_loss   = gfd.nn.GraphLoss(lambda_d=0.25),
    validation_loss = gfd.nn.GraphLoss(),
    epochs          = 500,
    num_steps       = [i for i in range(1, 11)],
    add_steps       = {{'tolerance': 0.005, 'loss': 'training'}},
    batch_size      = 8,
    lr              = 1e-5,
    grad_clip       = {{"epoch": 0, "limit": 1}},
    scheduler       = {{"factor": 0.5, "patience": 5, "loss": 'training'}},
    stopping        = 1e-8,
    mixed_precision = True,
)

# Training dataset
path = "<Path to dataset NsCircle.h5>"  # https://doi.org/10.5281/zenodo.7870707
transform = Compose([
    gfd.transforms.SpatialSort(),      # Morton order: fast TPU gather path
    gfd.transforms.GuillardCoarseningAndConnectKNN(
        k={ks}, period=(None, "auto"), scale_edge_attr={scales}),
    gfd.transforms.ScaleNs({{"u": (-2.1, 2.6), "v": (-2.25, 2.1),
                            "p": (-3.7, 2.35), "Re": (500, 1000)}},
                           format='uvp'),
    gfd.transforms.BuildKnnInterpWeights(6),
    gfd.transforms.RandomGraphRotation(eq='ns', format='uvp'),
    gfd.transforms.RandomGraphFlip(eq='ns', format='uvp'),
    gfd.transforms.AddUniformNoise(0.01),
])
dataset = gfd.datasets.NsCircle(
    format='uvp', path=path,
    training_info={{"n_in": 1, "n_out": train_config['num_steps'][-1],
                   "step": 1, "T": 100}},
    transform=transform)
train_set, test_set = random_split(dataset, [1000, 32])
train_loader = gfd.DataLoader(train_set,
                              batch_size=train_config['batch_size'],
                              shuffle=True)
val_loader = gfd.DataLoader(test_set,
                            batch_size=train_config['batch_size'],
                            shuffle=False)

# Model definition
{arch}
model = gfd.nn.{cls}(arch=arch)
print("Number of trainable parameters: ", model.num_params)

# Training
model.fit(train_config, train_loader, val_loader=val_loader)
'''

REMUS_SCRIPT = '''"""Training script for the NsRotEquiThreeScaleGNN (REMuS-GNN) model on the
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
'''


def write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)
    print("wrote", path)


def main():
    root = "examples/training"
    ns_cells = {"NsOneScaleGNN": None, "NsTwoScaleGNN": "0.15",
                "NsThreeScaleGNN": "0.15, 0.30",
                "NsFourScaleGNN": "0.15, 0.30, 0.60"}
    for cls, plan in NS_PLANS.items():
        short = f"{cls[2]}S-GNN".replace("O", "1").replace("T", "2") \
            if False else {"NsOneScaleGNN": "1S-GNN", "NsTwoScaleGNN":
                           "2S-GNN", "NsThreeScaleGNN": "3S-GNN",
                           "NsFourScaleGNN": "4S-GNN"}[cls]
        arch = arch_lines(plan, 5, 3)
        text = NS_HEADER.format(cls=cls, short=short, arch=arch,
                                cells=ns_cells[cls] or "")
        if ns_cells[cls] is None:
            text = text.replace(
                "    gfd.transforms.GridClustering([]),\n", "")
        write(f"{root}/NsMuSGNN/{cls}.py", text)

    adv_cells = {"AdvOneScaleGNN": None, "AdvTwoScaleGNN": "0.02",
                 "AdvThreeScaleGNN": "0.02, 0.04",
                 "AdvFourScaleGNN": "0.02, 0.04, 0.08"}
    for cls, plan in ADV_PLANS.items():
        short = {"AdvOneScaleGNN": "1S-GNN", "AdvTwoScaleGNN": "2S-GNN",
                 "AdvThreeScaleGNN": "3S-GNN",
                 "AdvFourScaleGNN": "4S-GNN"}[cls]
        arch = arch_lines(plan, 4, 1)
        text = ADV_HEADER.format(cls=cls, short=short, arch=arch,
                                 cells=adv_cells[cls] or "")
        if adv_cells[cls] is None:
            text = text.replace(
                "    gfd.transforms.GridClustering([]),\n", "")
        write(f"{root}/AdvMuSGNN/{cls}.py", text)

    mugs_scales = {2: "(0.1, 0.25)", 3: "(0.1, 0.25, 0.5)",
                   4: "(0.1, 0.25, 0.5, 1.0)"}
    mugs_refs = {"NsTwoGuillardScaleGNN": "NsTwoGuillardSacleGNN",
                 "NsThreeGuillardScaleGNN": "NsThreeGuillardSacleGNN",
                 "NsFourGuillardScaleGNN": "NsFourGuillardSacleGNN"}
    for cls, (levels, plan) in MUGS_PLANS.items():
        entries = [("enc", "edge_encoder")] + \
            [("enc", f"edge_encoder{i}") for i in range(2, levels + 1)] + plan
        arch = arch_lines(entries, 5, 3)
        short = f"{levels}GS-GNN"
        ks = "(" + ", ".join(["6"] * levels) + ")"
        text = MUGS_HEADER.format(cls=cls, short=short, arch=arch, ks=ks,
                                  scales=mugs_scales[levels],
                                  refname=mugs_refs[cls])
        write(f"{root}/NsMuGSGNN/{cls}.py", text)

    write(f"{root}/NsREMuSGNN/NsRotEquiThreeScaleGNN.py", REMUS_SCRIPT)

    write(f"{root}/distributed/NsThreeScaleGNN_dp.py", DIST_SCRIPT)


DIST_SCRIPT = '''"""Distributed training of NsThreeScaleGNN on a TPU device mesh.

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
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python \\
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
'''


if __name__ == "__main__":
    main()
