"""Multi-chip AL pool scoring: sharding the pool over the device mesh must
produce the identical selection to single-device scoring.

This is the AL-specific distributed step (SURVEY.md §2.6): the reference
shards pool inference over DDP ranks and pickles detections/features to
rank 0 (tools/active_select.py + det3d/utils/dist/dist_common.py:48); here
the jitted predict runs on a batch sharded over the mesh 'data' axis and the
replicated k-center consumes the gathered embeddings.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dal3d_tpu.parallel.mesh import make_mesh, shard_batch
from dal3d_tpu.ops.kcenter import kcenter_features

pytestmark = pytest.mark.slow


def _setup():
    import __graft_entry__ as ge

    bundle, batch = ge._tiny_setup(batch=8)
    from dal3d_tpu.runtime.steps import create_train_state, make_predict_step
    from dal3d_tpu.solver.optim import OneCycleSchedule, build_optimizer

    opt = build_optimizer(OneCycleSchedule(total_steps=10))
    state = create_train_state(bundle, opt, jax.random.PRNGKey(0), batch)
    # make the frames distinct so the selection order is non-trivial
    rng = np.random.RandomState(1)
    pts = np.array(batch["points"])  # writable copy
    pts[..., :3] += rng.normal(0, 0.5, pts[..., :3].shape).astype(np.float32)
    pool = {
        "points": jnp.asarray(pts),
        "points_valid": batch["points_valid"],
    }
    return bundle, state, pool


def _select(emb, k=4):
    N = emb.shape[0]
    sel, count, _ = kcenter_features(
        jnp.asarray(emb, jnp.float32),
        jnp.full((N,), 0.12),
        jnp.asarray(10.0),
        jnp.full((N,), jnp.inf),
        jnp.asarray(0),
        jnp.zeros((N,), bool),
        max_select=k,
    )
    return np.asarray(sel)[: int(count)]


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_pool_scoring_matches_single_device():
    bundle, state, pool = _setup()
    from dal3d_tpu.runtime.steps import make_predict_step

    predict = make_predict_step(bundle)

    # single device: everything on device 0
    single = {k: jax.device_put(v, jax.devices()[0]) for k, v in pool.items()}
    out_single = predict(state.params, state.batch_stats, single)
    emb_single = np.asarray(out_single["embedding"], np.float32)

    # mesh: frames sharded over 'data' (4) x 'model' (2)
    mesh = make_mesh(n_data=4, n_model=2)
    out_mesh = predict(state.params, state.batch_stats, shard_batch(pool, mesh))
    emb_mesh = np.asarray(out_mesh["embedding"], np.float32)

    np.testing.assert_allclose(emb_mesh, emb_single, rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(_select(emb_mesh), _select(emb_single))
    np.testing.assert_allclose(
        np.asarray(out_mesh["score_entropy"]),
        np.asarray(out_single["score_entropy"]),
        rtol=2e-3, atol=2e-4,
    )
