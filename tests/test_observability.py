"""Fast-path observability (VERDICT r3 weak #4): collate and the engine
dispatch sites record which plans attached / kernels engaged, so a silent
fallback to the slow path is visible in bench.py's JSON and the fit log."""
import numpy as np

import graphs4cfd_tpu as g4c
from graphs4cfd_tpu import config as g4c_config
from graphs4cfd_tpu import transforms as T
from graphs4cfd_tpu.graph import Graph
from graphs4cfd_tpu.loader import collate


def _remus_graph(rng):
    g = Graph()
    g.pos = (rng.random((600, 2)) * np.array([4.0, 2.0])).astype(np.float32)
    g.glob = np.full((600, 1), 0.5, np.float32)
    g.field = rng.normal(size=(600, 2)).astype(np.float32)
    g.target = rng.normal(size=(600, 8)).astype(np.float32)
    g.omega = np.zeros((600, 1), np.float32)
    g.bound = np.zeros(600, np.uint8)
    return g


def test_collate_records_plan_choices(rng):
    g4c_config.fast_path_report(reset=True)
    tf = T.BuildRemusGraph(num_levels=2, k=5, scale_edge_length=[0.1, 0.2])
    collate([tf(_remus_graph(rng)), tf(_remus_graph(rng))], node_bucket=64)
    rep = g4c_config.fast_path_report()
    assert any(k.startswith("wg_plan:") for k in rep), rep
    assert any(k.startswith("fold_plan_l1:") for k in rep), rep
    # the ladder fix means the folded L1 plan must attach, not fall back
    assert not rep.get("fold_plan_l1:none"), rep


def test_forward_records_kernel_choices(rng):
    from tests.test_models import mus_arch, build_mus_batch
    g4c_config.fast_path_report(reset=True)
    model = g4c.nn.MuSGNN(arch=mus_arch(2 + 2 + 1, 1), seed=3)
    batch = build_mus_batch(np.random.default_rng(1), [90], pad=True)
    model.forward(batch.to_device())
    rep = g4c_config.fast_path_report()
    assert any(k.startswith("gn_block:") for k in rep), rep


def test_collate_sharded_records_final_decision_once(rng):
    """collate_sharded suppresses the per-shard/exploratory plan records
    and reports ONE final wg_plan entry reflecting what the sharded batch
    actually carries (ADVICE r4 #2)."""
    from graphs4cfd_tpu.loader import collate_sharded
    from graphs4cfd_tpu.utils import Compose

    def cloud(n):
        g = Graph()
        g.pos = rng.random((n, 2)).astype(np.float32)
        g.field = rng.normal(size=(n, 1)).astype(np.float32)
        g.target = rng.normal(size=(n, 2)).astype(np.float32)
        g.omega = np.zeros((n, 1), np.float32)
        g.bound = np.ones(n, np.uint8)
        return g

    tf = Compose([T.SpatialSort(), T.ConnectKNN(4, period=(1.0, 1.0)),
                  T.ScaleEdgeAttr(0.05)])
    gs = [tf(cloud(600)) for _ in range(4)]
    g4c_config.fast_path_report(reset=True)
    batch = collate_sharded(gs, 2, node_bucket=64, edge_bucket=128)
    rep = g4c_config.fast_path_report(reset=True)
    wg = {k: v for k, v in rep.items() if k.startswith("wg_plan:")}
    assert sum(wg.values()) == 1, rep          # exactly one record
    # and the record matches the batch contents
    if "wg_starts" in batch.data:
        assert wg == {f"wg_plan:w{batch.data['wg_window']}": 1}, (wg, rep)
    else:
        assert wg == {"wg_plan:none": 1}, (wg, rep)


def test_suppress_choice_recording_nests():
    g4c_config.fast_path_report(reset=True)
    with g4c_config.suppress_choice_recording():
        g4c_config.record_choice("x", "a")
        with g4c_config.suppress_choice_recording():
            g4c_config.record_choice("x", "b")
        g4c_config.record_choice("x", "c")
    g4c_config.record_choice("x", "d")
    assert g4c_config.fast_path_report(reset=True) == {"x:d": 1}
