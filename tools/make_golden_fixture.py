#!/usr/bin/env python
"""Generate the committed golden parity fixture (run ONCE, torch required).

Freezes the torch reference replica's outputs for the canned dense scene —
raw neck/head activations (the executable record of the reference forward,
tests/test_convert_second.py oracle) — plus this package's full jitted
predict-path outputs downstream of them: post-NMS detections
(multi_group_predict — reference mg_head.py:697-1085) and the nuScenes
submission dicts (detections_to_nusc_boxes — reference nuscenes.py:181-320,
nusc_common.py:222-266 yaw/attribute conventions).

tests/test_golden_fixture.py then asserts the whole chain WITHOUT torch:
the seeded state_dict is numpy-regenerated, so only the frozen outputs need
committing (tests/fixtures/golden_second.npz + golden_submission.json).
Regenerate only when the fixture contract itself changes — the point of the
file is that refactors must reproduce it.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def canned_info():
    """A nuScenes-style info with NON-trivial sensor/ego transforms so the
    submission conversion's rotation/translation chain is exercised."""

    def _pose(yaw, t):
        c, s = np.cos(yaw), np.sin(yaw)
        m = np.eye(4)
        m[:2, :2] = [[c, -s], [s, c]]
        m[:3, 3] = t
        return m

    # info stores the INVERSE transforms (ref_from_car / car_from_global)
    return {
        "token": "golden_scene_0",
        "ref_from_car": np.linalg.inv(_pose(0.3, [1.0, 2.0, 0.5])),
        "car_from_global": np.linalg.inv(_pose(1.1, [100.0, 50.0, 1.0])),
    }


def main():
    from dal3d_tpu.utils.platform import setup_jax

    jax = setup_jax(force_cpu=True)
    import jax.numpy as jnp

    from dal3d_tpu.data.datasets.nusc_eval import detections_to_nusc_boxes
    from dal3d_tpu.models.convert_second import convert_second_state_dict
    from dal3d_tpu.models.heads.mg_head import multi_group_predict
    from oracle_utils import (GOLDEN_CLASS_NAMES, build_oracle_model,
                              dense_voxels, golden_predict_setup,
                              rnd_state_dict)
    from test_convert_second import _torch_reference_forward  # needs torch

    rng = np.random.RandomState(0)
    sd = rnd_state_dict(rng, normalized=True)
    vf, vc, vv, dense_in = dense_voxels(rng)

    # --- torch reference forward (frozen) ---
    neck_ref, preds_ref = _torch_reference_forward(sd, dense_in)

    # --- full jitted predict path on the converted weights ---
    params, stats = convert_second_state_dict(sd, nested_l0=False)
    model = build_oracle_model("gather")
    task_anchors, coder, test_cfg = golden_predict_setup()

    @jax.jit
    def predict(vf, vc, vv):
        out = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.zeros((1, 16, 5), jnp.float32), jnp.ones((1, 16), bool),
            False, voxels=(vf, vc, vv))
        return out, multi_group_predict(out["preds"], task_anchors, coder, test_cfg)

    out, dets = predict(jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(vv))

    # forward must match torch before anything is frozen
    np.testing.assert_allclose(np.asarray(out["neck_feat"]), neck_ref,
                               rtol=2e-3, atol=2e-3)

    fixdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    os.makedirs(fixdir, exist_ok=True)
    arrs = {"neck_ref": neck_ref}
    for t, (box_ref, cls_ref) in enumerate(preds_ref):
        arrs[f"box_ref_{t}"] = box_ref
        arrs[f"cls_ref_{t}"] = cls_ref
    for k in ("box3d_lidar", "scores", "label_preds", "det_valid"):
        arrs[f"det_{k}"] = np.asarray(dets[k])
    np.savez_compressed(os.path.join(fixdir, "golden_second.npz"), **arrs)

    info = canned_info()
    det0 = {k: np.asarray(v[0]) for k, v in dets.items()
            if k in ("box3d_lidar", "scores", "label_preds", "det_valid")}
    submission = detections_to_nusc_boxes(det0, info, GOLDEN_CLASS_NAMES)
    assert submission, "canned scene produced no detections — fixture useless"
    with open(os.path.join(fixdir, "golden_submission.json"), "w") as f:
        json.dump({
            "info": {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                     for k, v in info.items()},
            "results": submission,
        }, f, indent=1)
    n_det = int(np.asarray(dets["det_valid"]).sum())
    print(f"golden fixture written: {n_det} detections, "
          f"{len(submission)} submission entries -> {fixdir}")


if __name__ == "__main__":
    main()
