"""Selector subsystem: k-center parity, buffer file contract, all selectors
end-to-end on synthetic infos."""
import json
import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from dal3d_tpu.ops.kcenter import kcenter_matrix, kcenter_numpy
from dal3d_tpu.selectors import build_selector
from dal3d_tpu.utils.fileio import dump, load

N = 60


def rand_dist(n, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 3)
    d = np.sqrt(((x[:, None] - x[None, :]) ** 2).sum(-1))
    return d.astype(np.float32)


def test_kcenter_device_matches_numpy():
    d = rand_dist(N, 1)
    costs = np.full(N, 0.2, np.float32)
    budget = 4.0  # ~20 picks
    first = np.int32(3)
    already = np.zeros(N, bool)
    init = np.full(N, np.inf, np.float32)
    sel, count, cost = kcenter_matrix(
        jnp.asarray(d), jnp.asarray(costs), jnp.asarray(np.float32(budget)),
        jnp.asarray(init), jnp.asarray(first), jnp.asarray(already), max_select=N,
    )
    got = np.asarray(sel)[: int(count)].tolist()
    ref, ref_cost = kcenter_numpy(d, costs, budget, init, 3, already)
    assert got == ref
    np.testing.assert_allclose(float(cost), ref_cost, rtol=1e-5)


def test_kcenter_with_prior_selection():
    d = rand_dist(N, 2)
    costs = np.full(N, 0.25, np.float32)
    already = np.zeros(N, bool)
    already[[5, 10, 15]] = True
    init = d[[5, 10, 15]].min(0)
    first = int(np.argmax(np.where(already, -np.inf, init)))
    sel, count, _ = kcenter_matrix(
        jnp.asarray(d), jnp.asarray(costs), jnp.asarray(np.float32(3.0)),
        jnp.asarray(init), jnp.asarray(np.int32(first)), jnp.asarray(already), max_select=N,
    )
    got = np.asarray(sel)[: int(count)].tolist()
    ref, _ = kcenter_numpy(d, costs, 3.0, init, first, already)
    assert got == ref
    assert not set(got) & {5, 10, 15}


@pytest.fixture()
def synth_env(tmp_path):
    """Synthetic infos + buffer + logs + scoring cache."""
    from dal3d_tpu.data.datasets.synthetic import make_synthetic_nuscenes

    root = str(tmp_path / "nusc")
    info_path = make_synthetic_nuscenes(root, n_frames=30, n_logs=3, points_per_frame=100, seed=0)
    buffer_file = str(tmp_path / "buffer.json")
    dump({"0": []}, buffer_file)
    # logs json (reference nuScenes log.json schema subset)
    infos = load(info_path)
    logfiles = sorted({i["cam_front_path"].split("/")[-1].split("__")[0] for i in infos})
    logs = [{"logfile": lf, "location": "singapore-onenorth"} for lf in logfiles]
    logs_file = str(tmp_path / "log.json")
    dump(logs, logs_file)
    # synthetic scoring cache
    rng = np.random.RandomState(0)
    npz = str(tmp_path / "pred.npz")
    np.savez(
        npz,
        embedding=rng.randn(len(infos), 16).astype(np.float32),
        score_entropy=rng.uniform(0.1, 0.6, len(infos)).astype(np.float32),
        scores=rng.uniform(0.1, 0.9, (len(infos), 24)).astype(np.float32),
        label_preds=rng.randint(0, 10, (len(infos), 24)),
        det_valid=np.ones((len(infos), 24), bool),
    )
    return dict(info_path=info_path, buffer_file=buffer_file, logs_file=logs_file,
                npz=npz, tmp=str(tmp_path), infos=infos)


def _run(env, cfg, budget=6):
    cfg = dict(cfg)
    cfg.update(budget=budget, buffer_file=env["buffer_file"], infos_origin=env["info_path"])
    sel = build_selector(cfg)
    sel.select_samples()
    sel.dump_file()
    buffer = load(env["buffer_file"])
    key = str(budget + 0)
    assert key in buffer
    chosen = buffer[key]
    assert len(chosen) == len(set(chosen)) > 0
    # cost accounting: total cost <= budget
    cost = sum(0.12 + 0.04 * len(env["infos"][i]["gt_names"]) for i in chosen)
    assert cost <= budget + 1e-6
    # subset infos written
    subset_path = env["info_path"].replace(".pkl", f"_{key}.pkl")
    assert os.path.exists(subset_path)
    assert len(load(subset_path)) == len(chosen)
    return chosen


def test_random_selector(synth_env):
    _run(synth_env, dict(type="RandomSelector"))


def test_temporal_selector(synth_env):
    _run(synth_env, dict(type="TemporalSelector"))


def test_spatial_selector(synth_env):
    _run(synth_env, dict(
        type="SpatialSelector", k=4, logs_file=synth_env["logs_file"],
        distance_store_file=os.path.join(synth_env["tmp"], "dij.npy"),
    ))


def test_eu_spatial_selector(synth_env):
    _run(synth_env, dict(type="EuSpatialSelector", logs_file=synth_env["logs_file"]))


def test_spatial_temporal_selector(synth_env):
    _run(synth_env, dict(
        type="SpatialTemporalSelector", k=4, logs_file=synth_env["logs_file"],
        distance_store_file=os.path.join(synth_env["tmp"], "dij2.npy"),
        normalize="exp", lambda_t=1, aggregate="sum",
    ))


def test_feature_entropy_badge_uwe(synth_env):
    for t in ("FeatureSelector", "EntropySelector", "BadgeSelector", "UWESelector"):
        dump({"0": []}, synth_env["buffer_file"])
        _run(synth_env, dict(type=t, pred_store_file=synth_env["npz"]))


def test_ppal_selector(synth_env):
    classes = ["car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian", "traffic_cone"]
    diff_file = os.path.join(synth_env["tmp"], "diff.json")
    dump({c: 1.0 + 0.1 * i for i, c in enumerate(classes)}, diff_file)
    _run(synth_env, dict(type="PPALSelector", pred_store_file=synth_env["npz"],
                         diff_file=diff_file, delta=1.5))


def test_cald_selector(synth_env):
    n = len(synth_env["infos"])
    rng = np.random.RandomState(1)
    order = rng.permutation(n).tolist()
    sorted_idx_file = os.path.join(synth_env["tmp"], "cald_sorted.json")
    dump(order, sorted_idx_file)
    jsdiv_file = os.path.join(synth_env["tmp"], "jsdiv.pkl")
    dump({i: float(rng.uniform()) for i in range(n)}, jsdiv_file)
    _run(synth_env, dict(type="CaldSelector", sorted_idx_file=sorted_idx_file,
                         jsdiv_file=jsdiv_file))


def test_combo_selectors(synth_env):
    for t in ("SpatialFeatureSelector", "SpatialTemporalFeatureSelector"):
        dump({"0": []}, synth_env["buffer_file"])
        _run(synth_env, dict(
            type=t, k=4, logs_file=synth_env["logs_file"],
            distance_store_file=os.path.join(synth_env["tmp"], f"dij_{t}.npy"),
            pred_store_file=synth_env["npz"],
        ))


def test_round_accumulation(synth_env):
    """Two AL rounds: second round's list contains the first's."""
    r1 = _run(synth_env, dict(type="TemporalSelector"), budget=4)
    cfg = dict(type="TemporalSelector", budget=4,
               buffer_file=synth_env["buffer_file"], infos_origin=synth_env["info_path"])
    sel = build_selector(cfg)
    assert sel.current_budget == "8"
    sel.select_samples()
    sel.dump_file()
    buffer = load(synth_env["buffer_file"])
    assert set(r1) <= set(buffer["8"])
    assert len(buffer["8"]) > len(r1)


def test_kcenter_pool_exhaustion_no_duplicates():
    """Regression: when the (restricted) pool is exhausted, selection must
    stop rather than emit duplicates (caught via PPAL's restricted FPS)."""
    d = rand_dist(10, 5)
    d[3:, :] = -np.inf
    d[:, 3:] = -np.inf
    costs = np.full(10, 0.1, np.float32)
    init = np.full(10, np.inf, np.float32)
    init[3:] = -np.inf  # pool = {0,1,2}
    sel, count, _ = kcenter_matrix(
        jnp.asarray(d), jnp.asarray(costs), jnp.asarray(np.float32(100.0)),
        jnp.asarray(init), jnp.asarray(np.int32(0)), jnp.asarray(np.zeros(10, bool)),
        max_select=10,
    )
    got = np.asarray(sel)[: int(count)].tolist()
    assert len(got) == len(set(got)) == 3
    assert set(got) == {0, 1, 2}


def test_streaming_kcenter_matches_matrix(synth_env):
    """streaming=True (kcenter_features, no N×N map) must pick exactly the
    same frames as the materialized-map path, incl. prior-selection init and
    PPAL's restrict_to pool masking."""
    def pick(cfg_extra):
        dump({"0": [0, 5]}, synth_env["buffer_file"])
        cfg = dict(pred_store_file=synth_env["npz"], budget=6,
                   buffer_file=synth_env["buffer_file"],
                   infos_origin=synth_env["info_path"], **cfg_extra)
        sel = build_selector(cfg)
        sel.select_samples()
        return sel.get_selected_samples()[sel.current_budget]

    a = pick(dict(type="FeatureSelector", streaming=False))
    b = pick(dict(type="FeatureSelector", streaming=True))
    assert a == b and len(a) > 2

    classes = ["car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian", "traffic_cone"]
    diff_file = os.path.join(synth_env["tmp"], "diff_stream.json")
    dump({c: 1.0 + 0.1 * i for i, c in enumerate(classes)}, diff_file)
    a = pick(dict(type="PPALSelector", diff_file=diff_file, delta=1.5, streaming=False))
    b = pick(dict(type="PPALSelector", diff_file=diff_file, delta=1.5, streaming=True))
    assert a == b


def test_exclude_buffer_blocks_seed_frames(synth_env):
    """exclude_buffer (the partial pipeline's seed set) removes externally
    labeled frames from the candidate pool — they are never re-selected."""
    env = synth_env
    seed_file = os.path.join(env["tmp"], "seed.json")
    seed_ids = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
    dump({"partial_01": seed_ids}, seed_file)
    chosen = _run(env, dict(type="SpatialTemporalSelector",
                            logs_file=env["logs_file"],
                            exclude_buffer=seed_file), budget=3)
    assert not set(chosen) & set(seed_ids), (chosen, seed_ids)


def test_run_pool_scoring_pipeline_depth_invariant(tmp_path):
    """The software-pipelined scoring loop (dispatch-ahead + lagged fetch)
    must keep per-frame results in loader order at ANY pipeline depth."""
    from dal3d_tpu.selectors.base_selector import BaseSelector
    from dal3d_tpu.utils.fileio import dump

    n, B, K = 10, 2, 4

    class _Loader:
        def __iter__(self):
            for i in range(0, n, B):
                yield {"idx": np.arange(i, i + B)}

    def detector(batch):
        i = batch["idx"]
        return {
            "embedding": np.tile(i[:, None].astype(np.float32), (1, 3)),
            "score_entropy": i.astype(np.float32),
            "scores": np.tile(i[:, None].astype(np.float32), (1, K)),
            "label_preds": np.tile(i[:, None], (1, K)).astype(np.int32),
            "det_valid": np.ones((B, K), bool),
        }

    import pickle

    buffer_file = str(tmp_path / "buffer.json")
    dump({"0": []}, buffer_file)
    infos_path = str(tmp_path / "infos.pkl")
    with open(infos_path, "wb") as f:
        pickle.dump([{"gt_names": []}] * n, f)
    results = {}
    for depth in (1, 2, 5):
        sel = BaseSelector(budget=4, buffer_file=buffer_file,
                           infos_origin=infos_path,
                           detector=detector, dataloader=_Loader())
        results[depth] = sel.run_pool_scoring(pipeline_depth=depth)
    for depth in (2, 5):
        for k in results[1]:
            np.testing.assert_array_equal(results[depth][k], results[1][k])
    np.testing.assert_array_equal(results[1]["score_entropy"], np.arange(n, dtype=np.float32))
