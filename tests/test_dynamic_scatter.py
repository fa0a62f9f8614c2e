"""DynamicScatter (max) + Lyft dataset."""
import numpy as np
import jax
import jax.numpy as jnp

from dal3d_tpu.ops.voxelize import VoxelConfig, dynamic_scatter


def test_dynamic_scatter_max_matches_oracle():
    cfg = VoxelConfig((-10, -10, -2, 10, 10, 2), (0.5, 0.5, 0.5), 5, 400)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-9, 9, (300, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.9, 1.9, 300)
    out = jax.jit(lambda p, v: dynamic_scatter(p, v, cfg, "max"))(
        jnp.asarray(pts), jnp.ones(300, bool)
    )
    from collections import defaultdict

    groups = defaultdict(list)
    for p in pts:
        c = np.floor((p[:3] - np.array([-10, -10, -2])) / 0.5).astype(int)
        if (c >= 0).all() and (c < [40, 40, 8]).all():
            groups[(c[2], c[1], c[0])].append(p)
    feats = {tuple(c): f for c, f, v in zip(
        np.asarray(out["coordinates"]), np.asarray(out["features"]), np.asarray(out["voxel_valid"])
    ) if v}
    assert len(feats) == len(groups) == int(out["num_voxels"])
    for k, plist in groups.items():
        np.testing.assert_allclose(feats[k], np.max(plist, axis=0), atol=1e-5)


def test_lyft_dataset(tmp_path):
    from dal3d_tpu.data.datasets.lyft import LyftDataset
    from dal3d_tpu.data.datasets.synthetic import make_synthetic_nuscenes

    info_path = make_synthetic_nuscenes(str(tmp_path), n_frames=3, points_per_frame=200, range_xy=7)
    ds = LyftDataset(info_path=info_path, nsweeps=1, test_mode=True)
    assert len(ds) == 3
    res = ds.evaluation({}, output_dir=str(tmp_path))
    assert "lyft" in res["results"]
