"""High-level inference API tests (NANO preset)."""

import numpy as np
import pytest

from ccvpe_tpu import api


@pytest.fixture(scope="module")
def model():
    return api.load_model(None, preset="NANO")


def test_predict_single_pair(model):
    rng = np.random.default_rng(0)
    grd = rng.integers(0, 255, (100, 222, 3), dtype=np.uint8)  # odd size
    sat = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    pose = model.predict(grd, sat, return_heatmap=True)
    h, w = model.cfg.sat_hw
    assert 0 <= pose.row < h and 0 <= pose.col < w
    assert 0 <= pose.probability <= 1
    assert 0 <= pose.orientation_deg < 360
    assert pose.heatmap.shape == (h, w)
    np.testing.assert_allclose(pose.heatmap.sum(), 1.0, atol=1e-3)
    # heatmap argmax agrees with the reported pose
    r, c = np.unravel_index(pose.heatmap.argmax(), pose.heatmap.shape)
    assert (r, c) == (pose.row, pose.col)


def test_predict_with_orientation_prior(model):
    rng = np.random.default_rng(1)
    grd = rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    p_full = model.predict(grd, sat)
    p_prior = model.predict(grd, sat, ori_noise=0.0)  # single-bin prior
    assert np.isfinite(p_prior.probability)
    # both orientation-prior variants are cached
    assert {k[0] for k in model._compiled} >= {None, 0}
    # deterministic across calls
    p2 = model.predict(grd, sat)
    assert (p2.row, p2.col) == (p_full.row, p_full.col)


def test_predict_batch_matches_single(model):
    rng = np.random.default_rng(2)
    grd = rng.integers(0, 255, (2, 64, 128, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (2, 128, 128, 3), dtype=np.uint8)
    batch = model.predict_batch(grd, sat)
    for i, p in enumerate(batch):
        single = model.predict(grd[i], sat[i])
        assert (p.row, p.col) == (single.row, single.col)


def test_load_model_from_orbax(tmp_path):
    import jax
    from ccvpe_tpu.io.checkpoint import CheckpointManager
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.train import loop as train_loop

    opt = train_loop.make_optimizer()
    state = train_loop.create_train_state(cvm.NANO, jax.random.PRNGKey(5),
                                          opt)
    mngr = CheckpointManager(str(tmp_path / "ck"))
    mngr.save(0, state, wait=True)
    mngr.close()
    m = api.load_model(str(tmp_path / "ck"), preset="NANO")
    a = np.asarray(m.params["sat_feature_to_descriptors"]["w"])
    b = np.asarray(state.params["sat_feature_to_descriptors"]["w"])
    np.testing.assert_array_equal(a, b)


def test_export_roundtrip(tmp_path):
    """export_model -> load_exported reproduces predict_batch exactly on the
    same platform (serialized StableHLO + pickled weights, no model code)."""
    import numpy as np
    from ccvpe_tpu import api
    from ccvpe_tpu.models import cvm

    model = api.CVMModel(cvm.NANO, *cvm.init(__import__("jax").random.PRNGKey(3),
                                             cvm.NANO))
    rng = np.random.default_rng(0)
    grd = rng.integers(0, 255, (2, *cvm.NANO.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (2, *cvm.NANO.sat_hw, 3), dtype=np.uint8)
    direct = model.predict_batch(grd, sat, return_heatmap=True)

    path = str(tmp_path / "export")
    api.export_model(model, path, batch=2)
    served = api.load_exported(path).predict_batch(grd, sat,
                                                   return_heatmap=True)
    for d, s in zip(direct, served):
        assert (d.row, d.col) == (s.row, s.col)
        np.testing.assert_allclose(d.heatmap, s.heatmap, rtol=0, atol=0)
        np.testing.assert_allclose(d.orientation_deg, s.orientation_deg)


def test_api_matching_impl_plumbing():
    """CVMModel(matching_impl='pallas') routes through the fused kernel
    (interpreter off-TPU) and agrees with the default einsum model."""
    import jax
    import numpy as np
    from ccvpe_tpu import api
    from ccvpe_tpu.models import cvm

    m_e = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(3), cvm.NANO))
    m_p = api.CVMModel(cvm.NANO, m_e.params, m_e.bn_state,
                       matching_impl="pallas")
    rng = np.random.default_rng(0)
    grd = rng.integers(0, 255, (*cvm.NANO.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (*cvm.NANO.sat_hw, 3), dtype=np.uint8)
    a, b = m_e.predict(grd, sat), m_p.predict(grd, sat)
    assert (a.row, a.col) == (b.row, b.col)
    assert abs(a.orientation_deg - b.orientation_deg) < 0.1


def test_save_torch_load_model_roundtrip(tmp_path):
    """api.save_torch writes a reference-format .pt that load_model reads
    back to identical params and BN state (any preset width)."""
    import jax
    import numpy as np
    from ccvpe_tpu import api
    from ccvpe_tpu.models import cvm

    m = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(0), cvm.NANO))
    path = str(tmp_path / "exported.pt")
    m.save_torch(path)
    m2 = api.load_model(path, preset="NANO")
    for a, b in zip(jax.tree_util.tree_leaves((m.params, m.bn_state)),
                    jax.tree_util.tree_leaves((m2.params, m2.bn_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_multiplatform(tmp_path):
    """platforms=("cpu","tpu") lowers one artifact for both backends; it
    deserializes and runs on the CPU test host."""
    import jax
    import numpy as np
    from ccvpe_tpu import api
    from ccvpe_tpu.models import cvm

    m = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(0), cvm.NANO))
    path = str(tmp_path / "export_multi")
    api.export_model(m, path, batch=1, platforms=("cpu", "tpu"))
    served = api.load_exported(path)
    rng = np.random.default_rng(0)
    grd = rng.integers(0, 255, (1, *cvm.NANO.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (1, *cvm.NANO.sat_hw, 3), dtype=np.uint8)
    direct = m.predict_batch(grd, sat)
    got = served.predict_batch(grd, sat)
    assert (got[0].row, got[0].col) == (direct[0].row, direct[0].col)
    assert np.isfinite(got[0].probability)


def test_bf16_trained_state_serves(tmp_path):
    """A --bf16_params training state (bf16 leaves + MasterState opt_state)
    loads through api.load_model and exports via save_torch (regression:
    both previously assumed f32/plain-adam trees)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ccvpe_tpu import api
    from ccvpe_tpu.io.checkpoint import CheckpointManager
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.train import loop as train_loop

    opt = train_loop.make_optimizer(f32_master=True)
    state = train_loop.create_train_state(
        cvm.NANO, jax.random.PRNGKey(0), opt, param_dtype=jnp.bfloat16)
    ckpt_dir = str(tmp_path / "ckpt")
    mngr = CheckpointManager(ckpt_dir)
    mngr.save(0, jax.device_get(state), wait=True)
    mngr.close()

    m = api.load_model(ckpt_dir, preset="NANO")
    for a, b in zip(jax.tree_util.tree_leaves(m.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pt = str(tmp_path / "exported.pt")
    m.save_torch(pt)  # must not choke on bfloat16 leaves
    m2 = api.load_model(pt, preset="NANO")
    for a, b in zip(jax.tree_util.tree_leaves(m.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_predict_limited_fov(model):
    """fov<360 crops the panorama and serves through a non-circular forward
    (BASELINE config 3 via the API; reference ``train_VIGOR.py:272-273``)."""
    rng = np.random.default_rng(4)
    grd = rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)  # full panorama
    sat = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    pose = model.predict(grd, sat, fov=180.0, ori_noise=18.0,
                         return_heatmap=True)
    assert np.isfinite(pose.probability)
    np.testing.assert_allclose(pose.heatmap.sum(), 1.0, atol=1e-3)
    # a fresh non-circular restricted-bin variant was compiled
    assert any(k[:2] == (1, False) for k in model._compiled)
    # pre-cropped input through predict_batch gives the identical pose
    batch = model.predict_batch(grd[None, :, :64], sat[None], fov=180.0,
                                ori_noise=18.0)
    assert (batch[0].row, batch[0].col) == (pose.row, pose.col)


def test_load_model_corrupt_checkpoint_surfaces_cause(tmp_path):
    """A corrupt orbax checkpoint raises the real restore failure with the
    alternate-template error chained — not a swallowed structure mismatch."""
    import glob
    import os

    import jax
    from ccvpe_tpu.io.checkpoint import CheckpointManager
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.train import loop as train_loop

    opt = train_loop.make_optimizer()
    state = train_loop.create_train_state(cvm.NANO, jax.random.PRNGKey(1),
                                          opt)
    ck = str(tmp_path / "ck")
    mngr = CheckpointManager(ck)
    mngr.save(0, jax.device_get(state), wait=True)
    mngr.close()
    # corrupt the array data (keep checkpoint-level metadata so the failure
    # happens during restore, where round 1 swallowed it)
    for f in glob.glob(os.path.join(ck, "0", "**"), recursive=True):
        base = os.path.basename(f).lower()
        if os.path.isfile(f) and "metadata" not in base:
            with open(f, "wb") as fh:
                fh.write(b"corrupt")
    with pytest.raises(Exception) as ei:
        api.load_model(ck, preset="NANO")
    chain, e = [], ei.value
    while e is not None and e not in chain:
        chain.append(e)
        e = e.__cause__ or e.__context__
    # the true cause (an orbax/IO/decode failure, not a silent template
    # structure mismatch) must be visible somewhere in the chain
    def is_real_cause(err):
        s = (type(err).__name__ + ": " + str(err)).lower()
        return any(t in s for t in ("corrupt", "decode", "parse", "read",
                                    "zarr", "ocdbt", "restore", "ck"))

    assert any(is_real_cause(err) for err in chain), chain


@pytest.mark.slow
def test_export_dynamic_batch(tmp_path):
    """batch='dynamic' exports one artifact with a symbolic batch dim that
    serves any batch size and matches fixed-batch predictions."""
    import jax
    from ccvpe_tpu.models import cvm

    m = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(6), cvm.NANO))
    path = str(tmp_path / "export_dyn")
    api.export_model(m, path, batch="dynamic")
    served = api.load_exported(path)
    rng = np.random.default_rng(0)
    for bs in (1, 3):
        grd = rng.integers(0, 255, (bs, *cvm.NANO.grd_hw, 3), dtype=np.uint8)
        sat = rng.integers(0, 255, (bs, *cvm.NANO.sat_hw, 3), dtype=np.uint8)
        got = served.predict_batch(grd, sat)
        want = m.predict_batch(grd, sat)
        for g, w in zip(got, want):
            assert (g.row, g.col) == (w.row, w.col)


@pytest.mark.slow
def test_predict_batch_data_parallel_mesh():
    """mesh='data' shards predict_batch over the 8 virtual devices and
    reproduces single-device poses exactly; a non-divisible single-pair
    predict falls back to replicated placement."""
    import jax
    from ccvpe_tpu.models import cvm

    params, bn = cvm.init(jax.random.PRNGKey(7), cvm.NANO)
    single = api.CVMModel(cvm.NANO, params, bn)
    sharded = api.CVMModel(cvm.NANO, params, bn, mesh="data")
    assert sharded.mesh is not None and sharded.mesh.size == 8

    rng = np.random.default_rng(8)
    grd = rng.integers(0, 255, (8, *cvm.NANO.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (8, *cvm.NANO.sat_hw, 3), dtype=np.uint8)
    a = single.predict_batch(grd, sat)
    b = sharded.predict_batch(grd, sat)
    for x, y in zip(a, b):
        assert (x.row, x.col) == (y.row, y.col)
        np.testing.assert_allclose(x.probability, y.probability, rtol=1e-4)

    p1 = sharded.predict(grd[0], sat[0])  # batch 1 on an 8-device mesh
    p2 = single.predict(grd[0], sat[0])
    assert (p1.row, p1.col) == (p2.row, p2.col)


def test_no_heatmap_path_matches(model):
    """return_heatmap=False uses the softmax-free readout (argmax over
    logits + logsumexp probability): identical pose, equal probability."""
    rng = np.random.default_rng(11)
    grd = rng.integers(0, 255, (2, *model.cfg.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (2, *model.cfg.sat_hw, 3), dtype=np.uint8)
    with_hm = model.predict_batch(grd, sat, return_heatmap=True)
    without = model.predict_batch(grd, sat, return_heatmap=False)
    for a, b in zip(with_hm, without):
        assert (a.row, a.col) == (b.row, b.col)
        np.testing.assert_allclose(a.probability, b.probability, rtol=1e-4)
        np.testing.assert_allclose(a.orientation_deg, b.orientation_deg,
                                   rtol=1e-5)
        assert b.heatmap is None and a.heatmap is not None
