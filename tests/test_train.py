"""Train-step tests on the TINY config: sharded-vs-single-device equivalence,
finite losses, BN-state updates, checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ccvpe_tpu.models import cvm
from ccvpe_tpu.ops import gt as gt_ops
from ccvpe_tpu.parallel import mesh as mesh_lib
from ccvpe_tpu.train import loop as train_loop


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = cvm.NANO
    opt = train_loop.make_optimizer(1e-4)
    state = train_loop.create_train_state(cfg, jax.random.PRNGKey(0), opt)
    rng = np.random.default_rng(0)
    b = 8
    h, w = cfg.sat_hw
    gh, gw = cfg.grd_hw
    gt, weights, omap = gt_ops.synthesize_batch_factored(
        jnp.asarray(rng.uniform(-20, 20, b), jnp.float32),
        jnp.asarray(rng.uniform(-20, 20, b), jnp.float32),
        jnp.asarray(rng.uniform(0, 360, b), jnp.float32),
        height=h, width=w, bins=cfg.bins)
    batch = {
        "grd": jnp.asarray(rng.standard_normal((b, gh, gw, 3)), jnp.float32),
        "sat": jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.float32),
        "gt": gt, "bin_weights": weights, "orientation": omap,
    }
    return cfg, opt, state, batch


def test_train_step_runs_and_updates(tiny_setup):
    cfg, opt, state, batch = tiny_setup
    step = train_loop.make_train_step(cfg, opt)
    new_state, parts = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k, v in parts.items():
        assert np.isfinite(float(v)), k
    # params changed
    delta = jax.tree_util.tree_reduce(
        lambda acc, ab: acc + float(jnp.abs(ab).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.params,
                               state.params), 0.0)
    assert delta > 0
    # BN running stats moved
    bn_delta = float(jnp.abs(
        new_state.bn_state["sat_efficientnet"]["bn0"]["mean"]
        - state.bn_state["sat_efficientnet"]["bn0"]["mean"]).sum())
    assert bn_delta > 0


def test_data_parallel_matches_single_device(tiny_setup):
    """Sharding the batch over 8 devices must not change the numerics
    (global-semantics jit): loss parts match the single-device step."""
    cfg, opt, state, batch = tiny_setup
    step = train_loop.make_train_step(cfg, opt)
    rng = jax.random.PRNGKey(1)

    _, parts_single = jax.jit(step)(state, batch, rng)

    mesh = mesh_lib.create_mesh()
    assert mesh.shape["data"] == 8
    sharded_step = train_loop.compile_train_step(step, mesh, donate=False)
    state_r = mesh_lib.replicate(mesh, state)
    batch_s = mesh_lib.shard_batch(mesh, batch)
    _, parts_shard = sharded_step(state_r, batch_s, rng)

    for k in parts_single:
        a, b = float(parts_single[k]), float(parts_shard[k])
        # measured drift is <=2e-6 on every part incl. grad_norm; keep the
        # bound tight so mis-reduced gradients (the GSPMD grouped-conv
        # hazard, see loop.py grad-accum comment) cannot hide inside it
        assert abs(a - b) < 1e-4 * max(1.0, abs(a)), (k, a, b)


@pytest.mark.slow
def test_hybrid_tensor_parallel_matches_single_device(tiny_setup):
    """Mesh(4 data, 2 model) with TP state shardings: two train steps must
    reproduce single-device numerics (loss parts and gradient norm) — the
    model-axis partitioning is a layout choice, not a semantics change."""
    cfg, opt, state0, batch = tiny_setup
    step = train_loop.make_train_step(cfg, opt)

    s_single = state0
    parts_single = []
    jstep = jax.jit(step, donate_argnums=())
    for i in range(2):
        s_single, p = jstep(s_single, batch, jax.random.PRNGKey(40 + i))
        parts_single.append(jax.device_get(p))

    mesh = mesh_lib.create_mesh(n_data=4, n_model=2)
    shardings = mesh_lib.tree_shardings(state0, mesh, min_size=1000)
    # the rule must actually shard something on the model axis
    n_sharded = sum(
        1 for sh in jax.tree_util.tree_leaves(shardings)
        if mesh_lib.MODEL_AXIS in str(sh.spec))
    assert n_sharded > 0
    s_tp = jax.tree_util.tree_map(jax.device_put, state0, shardings)
    compiled = train_loop.compile_train_step(step, mesh, donate=False,
                                             state_shardings=shardings)
    batch_s = mesh_lib.shard_batch(mesh, batch)
    for i in range(2):
        s_tp, p = compiled(s_tp, batch_s, jax.random.PRNGKey(40 + i))
        p = jax.device_get(p)
        for k in parts_single[i]:
            a, b = float(parts_single[i][k]), float(p[k])
            tol = 1e-3 if k == "grad_norm" else 1e-4
            assert abs(a - b) < tol * max(1.0, abs(a)), (i, k, a, b)


@pytest.mark.slow
def test_grad_accum_on_mesh_matches_single_device(tiny_setup):
    """--grad_accum under a sharded mesh: the in-jit microbatch scan must
    reproduce single-device grad-accum numerics (the reshape to
    [accum, micro, ...] re-lays the sharded batch; a layout change, not a
    semantics change)."""
    cfg, opt, state0, batch = tiny_setup
    step = train_loop.make_train_step(cfg, opt, grad_accum=2)

    s_single, parts_single = jax.jit(step, donate_argnums=())(
        state0, batch, jax.random.PRNGKey(7))
    parts_single = jax.device_get(parts_single)

    # 4-way data mesh: each microbatch of 4 still divides the mesh
    mesh = mesh_lib.create_mesh(n_data=4)
    compiled = train_loop.compile_train_step(step, mesh, donate=False)
    s_mesh = mesh_lib.replicate(mesh, state0)
    batch_s = mesh_lib.shard_batch(mesh, batch)
    s_mesh, parts_mesh = compiled(s_mesh, batch_s, jax.random.PRNGKey(7))
    parts_mesh = jax.device_get(parts_mesh)

    for k in parts_single:
        a, b = float(parts_single[k]), float(parts_mesh[k])
        tol = 1e-3 if k == "grad_norm" else 1e-4
        assert abs(a - b) < tol * max(1.0, abs(a)), (k, a, b)
    # updated params agree.  Tolerance is in lr units (1e-4): Adam's
    # m/sqrt(v) normalization turns reduction-order noise on near-zero
    # gradients (e.g. final-conv biases, whose true grad is exactly 0)
    # into full-size update-direction flips, so single-vs-mesh drift up to
    # a couple of lr on those leaves is expected float behavior.
    err = jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(x - y))),
        jax.device_get(s_single.params), jax.device_get(s_mesh.params))
    assert max(jax.tree_util.tree_leaves(err)) < 1e-3


def test_remat_grad_accum_zero1_compose(tiny_setup):
    """The three perf levers a production run stacks (--remat encoder
    --grad_accum 2 --zero1) must compose in one jitted step on a mesh."""
    cfg, opt, state0, batch = tiny_setup
    step = train_loop.make_train_step(cfg, opt, remat="encoder",
                                      grad_accum=2)
    mesh = mesh_lib.create_mesh(n_data=4)
    shardings = mesh_lib.zero1_state_shardings(state0, mesh, min_size=1000)
    s = jax.tree_util.tree_map(jax.device_put, state0, shardings)
    compiled = train_loop.compile_train_step(step, mesh, donate=False,
                                             state_shardings=shardings)
    s, parts = compiled(s, mesh_lib.shard_batch(mesh, batch),
                        jax.random.PRNGKey(9))
    assert int(jax.device_get(s.step)) == 1
    for k, v in jax.device_get(parts).items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_zero1_matches_replicated(tiny_setup):
    """ZeRO-1 data-axis sharding of the optimizer state is a layout choice:
    two train steps must reproduce the replicated-state numerics (loss,
    grad norm), while the Adam moments are actually sharded over 'data'."""
    cfg, opt, state0, batch = tiny_setup
    step = train_loop.make_train_step(cfg, opt)

    mesh = mesh_lib.create_mesh()  # 8-way data
    repl_step = train_loop.compile_train_step(step, mesh, donate=False)
    s_repl = mesh_lib.replicate(mesh, state0)
    batch_s = mesh_lib.shard_batch(mesh, batch)
    parts_repl = []
    for i in range(2):
        s_repl, p = repl_step(s_repl, batch_s, jax.random.PRNGKey(50 + i))
        parts_repl.append(jax.device_get(p))

    shardings = mesh_lib.zero1_state_shardings(state0, mesh, min_size=1000)
    n_sharded = sum(
        1 for sh in jax.tree_util.tree_leaves(shardings.opt_state)
        if mesh_lib.DATA_AXIS in str(sh.spec))
    assert n_sharded > 0, "ZeRO-1 rule sharded nothing"
    # params stay replicated (pure-DP compute unchanged)
    assert all(sh.spec == () or all(a is None for a in sh.spec)
               for sh in jax.tree_util.tree_leaves(shardings.params))
    s_z = jax.tree_util.tree_map(jax.device_put, state0, shardings)
    z_step = train_loop.compile_train_step(step, mesh, donate=False,
                                           state_shardings=shardings)
    for i in range(2):
        s_z, p = z_step(s_z, batch_s, jax.random.PRNGKey(50 + i))
        p = jax.device_get(p)
        for k in parts_repl[i]:
            a, b = float(parts_repl[i][k]), float(p[k])
            tol = 1e-3 if k == "grad_norm" else 1e-4
            assert abs(a - b) < tol * max(1.0, abs(a)), (i, k, a, b)
    # final states agree too (the all-gathered updates are identical)
    pr = jax.device_get(s_repl.params)
    pz = jax.device_get(s_z.params)
    err = jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(x - y))), pr, pz)
    assert max(jax.tree_util.tree_leaves(err)) < 1e-5


def test_trainer_zero1_end_to_end(tiny_setup, tmp_path):
    """Trainer(zero1=True) end to end: train a step + evaluate (the CLI
    --zero1 path)."""
    from ccvpe_tpu.train.harness import Trainer

    cfg, _, _, batch = tiny_setup
    raw = jax.device_get(batch)
    tr = Trainer(cfg, results_dir=str(tmp_path / "results"), batch_size=8,
                 zero1=True, log_every=1)
    tr.init_state(seed=5)
    assert tr._state_shardings is not None
    n_sharded = sum(
        1 for sh in jax.tree_util.tree_leaves(tr._state_shardings.opt_state)
        if mesh_lib.DATA_AXIS in str(sh.spec))
    assert n_sharded > 0
    tr.train_epoch([raw], lambda r: r, epoch=0)
    assert int(jax.device_get(tr.state.step)) == 1
    summary = tr.evaluate([raw], lambda r: r, meter_per_pixel=1.0)
    assert np.isfinite(summary["mean_distance_m"])


def test_trainer_n_model_end_to_end(tiny_setup, tmp_path):
    """Trainer(n_model=2) builds the hybrid mesh, shards the state, trains a
    step, and evaluates — the CLI --n_model path end to end."""
    from ccvpe_tpu.train.harness import Trainer

    cfg, _, _, batch = tiny_setup
    raw = jax.device_get(batch)
    tr = Trainer(cfg, results_dir=str(tmp_path / "results"), batch_size=8,
                 n_model=2, log_every=1)
    assert dict(tr.mesh.shape) == {"data": 4, "model": 2}
    tr.init_state(seed=5)
    # state is actually sharded over the model axis
    assert tr._state_shardings is not None
    n_sharded = sum(
        1 for sh in jax.tree_util.tree_leaves(tr._state_shardings)
        if mesh_lib.MODEL_AXIS in str(sh.spec))
    assert n_sharded > 0
    tr.train_epoch([raw], lambda r: r, epoch=0)
    assert int(jax.device_get(tr.state.step)) == 1

    summary = tr.evaluate([dict(raw, orientation_from_north=np.zeros(8))],
                          lambda r: {k: v for k, v in r.items()
                                     if k != "orientation_from_north"},
                          meter_per_pixel=1.0, with_heading=True)
    assert np.isfinite(summary["mean_distance_m"])
    assert "mean_lateral_m" in summary


def test_eval_step_sharded(tiny_setup):
    cfg, opt, state, batch = tiny_setup
    mesh = mesh_lib.create_mesh()
    eval_step = train_loop.make_eval_step(cfg)
    fn = train_loop.compile_eval_step(eval_step, mesh)
    out = fn(mesh_lib.replicate(mesh, state.params),
             mesh_lib.replicate(mesh, state.bn_state),
             *(mesh_lib.shard_batch(mesh, (batch["grd"], batch["sat"]))))
    hm = np.asarray(out.heatmap)
    assert hm.shape == (8, cfg.sat_hw[0], cfg.sat_hw[1], 1)
    np.testing.assert_allclose(hm.reshape(8, -1).sum(1), 1.0, atol=1e-3)


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    from ccvpe_tpu.io.checkpoint import CheckpointManager

    cfg, opt, state, batch = tiny_setup
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(0, state, wait=True)
    template = train_loop.create_train_state(cfg, jax.random.PRNGKey(7), opt)
    restored = mngr.restore(template)
    mngr.close()
    before = jax.tree_util.tree_leaves(state.params)
    after = jax.tree_util.tree_leaves(restored.params)
    assert len(before) == len(after)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_training_learns_overfit(tiny_setup):
    """30 donated steps on one fixed batch must drive the loss down
    substantially — catches loss-sign/gradient-plumbing errors that
    shape-checks cannot."""
    cfg, opt, state, batch = tiny_setup
    import optax
    opt_fast = train_loop.make_optimizer(3e-4)
    state = train_loop.create_train_state(cfg, jax.random.PRNGKey(3),
                                          opt_fast)
    step = train_loop.make_train_step(cfg, opt_fast)
    jstep = jax.jit(step, donate_argnums=(0,))
    losses = []
    for i in range(30):
        state, parts = jstep(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(parts["loss"]))
    assert np.isfinite(losses).all()
    # robust decrease: mean of last 5 well below mean of first 5
    early, late = np.mean(losses[:5]), np.mean(losses[-5:])
    assert late < 0.7 * early, (early, late)
    # heatmap CE should individually improve too
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_trainer_checkpoint_cadence_and_resume(tiny_setup, tmp_path):
    """The global step advances every batch; mid-epoch saves fire every
    ``checkpoint_every_steps``; per-epoch saves are keyed by the true global
    step (one distinct checkpoint per epoch, exceeding the reference's
    ``torch.save`` cadence, ``train_VIGOR.py:159-163``); and a fresh Trainer
    resumes from the latest step with the step counter intact."""
    from ccvpe_tpu.train.harness import Trainer

    cfg, _, _, batch = tiny_setup
    raw = jax.device_get(batch)
    loader = [raw] * 3          # 3 steps per "epoch"
    ident = lambda r: r
    ckdir = str(tmp_path / "ckpt")

    tr = Trainer(cfg, checkpoint_dir=ckdir,
                 results_dir=str(tmp_path / "results"), batch_size=8,
                 checkpoint_every_steps=2, log_every=2)
    tr.init_state(seed=5)
    tr.train_epoch(loader, ident, epoch=0)
    # steps 1-3: mid-epoch save at 2, end-of-epoch save at 3
    assert tr.ckpt.all_steps() == [2, 3]
    tr.train_epoch(loader, ident, epoch=1)
    # steps 4-6: mid-epoch at 4 and 6; end-of-epoch skipped (6 just saved);
    # max_to_keep=3 prunes step 2
    assert tr.ckpt.all_steps() == [3, 4, 6]
    assert int(jax.device_get(tr.state.step)) == 6
    assert tr._global_step == 6
    tr.ckpt.close()

    tr2 = Trainer(cfg, checkpoint_dir=ckdir,
                  results_dir=str(tmp_path / "results"), batch_size=8,
                  checkpoint_every_steps=0, log_every=2)
    assert tr2.resume()
    assert tr2._global_step == 6
    # epoch position restored: epoch 1 completed (the end-of-epoch
    # save_meta upgrade of the step-6 mid-epoch save) -> restart at 2,
    # not 0 — a preempted run must not retrain completed epochs
    assert tr2.start_epoch == 2
    assert int(jax.device_get(tr2.state.step)) == 6
    # optimizer moments came back too (non-zero after 6 Adam steps)
    mom = jax.tree_util.tree_leaves(tr2.state.opt_state)
    assert any(float(jnp.abs(m).max()) > 0 for m in mom
               if hasattr(m, "dtype") and m.dtype == jnp.float32)
    tr2.train_epoch(loader, ident, epoch=2)
    assert int(jax.device_get(tr2.state.step)) == 9
    assert tr2.ckpt.all_steps()[-1] == 9
    tr2.ckpt.close()


@pytest.mark.slow
def test_bf16_param_residency(tiny_setup):
    """bf16-resident params with an f32 master: the master stays float32,
    the resident params track cast(master) after every step, and the loss
    trajectory stays close to the all-f32 run."""
    cfg, _, state32, batch = tiny_setup
    opt = train_loop.make_optimizer(1e-3, f32_master=True)
    state = train_loop.create_train_state(
        cfg, jax.random.PRNGKey(0), opt, param_dtype=jnp.bfloat16)
    assert all(p.dtype == jnp.bfloat16
               for p in jax.tree_util.tree_leaves(state.params))
    master = state.opt_state.master
    assert all(m.dtype == jnp.float32
               for m in jax.tree_util.tree_leaves(master))

    step = jax.jit(train_loop.make_train_step(
        cfg, opt, compute_dtype=jnp.bfloat16))
    for i in range(3):
        state, parts = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(parts["loss"]))
    # residency invariant: params == round(master) to within 1 bf16 ULP per
    # leaf.  Exact equality is not guaranteed: the optimizer emits
    # u = m_new - p in f32 and apply_updates computes round_bf16(p + u),
    # which can land one ULP off round_bf16(m_new) when p and m_new are not
    # within the Sterbenz range (the off-by-one is transient — the next
    # step's delta re-converges the resident copy).
    def ulp_mismatch(p, m):
        target = m.astype(jnp.bfloat16).astype(jnp.float32)
        # bf16 ULP at t (7 explicit mantissa bits): 2**(exponent(t) - 8)
        # with frexp's mantissa-in-[0.5, 1) exponent convention
        _, exp = jnp.frexp(jnp.where(target == 0, 1e-38, target))
        ulp = jnp.exp2(exp.astype(jnp.float32) - 8.0)
        return float(jnp.max(jnp.abs(p.astype(jnp.float32) - target) / ulp))

    mismatch = jax.tree_util.tree_map(ulp_mismatch, state.params,
                                      state.opt_state.master)
    worst = max(jax.tree_util.tree_leaves(mismatch))
    # 1.5 separates the benign off-by-one (plus fp noise in the ratio
    # itself) from real divergence (>= 2 ULP)
    assert worst < 1.5, f"resident params diverged from master by {worst} ULP"

    # trajectory sanity vs the f32 reference optimizer at the same LR
    opt32 = train_loop.make_optimizer(1e-3)
    s32 = train_loop.create_train_state(cfg, jax.random.PRNGKey(0), opt32)
    step32 = jax.jit(train_loop.make_train_step(cfg, opt32))
    for i in range(3):
        s32, parts32 = step32(s32, batch, jax.random.PRNGKey(i))
    rel = abs(float(parts["loss"]) - float(parts32["loss"])) / max(
        abs(float(parts32["loss"])), 1e-9)
    assert rel < 0.05, (float(parts["loss"]), float(parts32["loss"]))


def test_bf16_checkpoint_roundtrip(tiny_setup, tmp_path):
    """Full-state checkpoint round-trip with the MasterState optimizer
    wrapper (bf16 resident params + f32 master copy)."""
    from ccvpe_tpu.io.checkpoint import CheckpointManager

    cfg, _, _, batch = tiny_setup
    opt = train_loop.make_optimizer(1e-3, f32_master=True)
    state = train_loop.create_train_state(
        cfg, jax.random.PRNGKey(11), opt, param_dtype=jnp.bfloat16)
    step = jax.jit(train_loop.make_train_step(
        cfg, opt, compute_dtype=jnp.bfloat16))
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(1, jax.device_get(state), wait=True)
    template = train_loop.create_train_state(
        cfg, jax.random.PRNGKey(99), opt, param_dtype=jnp.bfloat16)
    restored = mngr.restore(jax.device_get(template))
    mngr.close()
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored opt state keeps the MasterState structure
    assert isinstance(restored.opt_state, train_loop.MasterState)


def test_trainer_mesh_sizing_errors():
    """Invalid n_model / batch combinations raise a clear ValueError instead
    of a ZeroDivisionError in the mesh sizing loop (review finding)."""
    from ccvpe_tpu.train.harness import Trainer

    with pytest.raises(ValueError, match="n_model"):
        Trainer(cvm.NANO, n_model=3)  # 8 virtual devices % 3 != 0
    with pytest.raises(ValueError, match="divisible"):
        Trainer(cvm.NANO, batch_size=9, n_model=2)
    # a valid combination still sizes the data axis to fit the batch
    t = Trainer(cvm.NANO, batch_size=12, n_model=2)
    assert dict(t.mesh.shape)["model"] == 2
    assert 12 % (dict(t.mesh.shape)["data"] * 2) == 0


def test_evaluate_device_and_host_readout_agree(tiny_setup, tmp_path):
    """Trainer.evaluate: the on-device pose readout (streaming fast path,
    double-buffered fetch) and the full-heatmap host readout produce the
    same metric summary."""
    from ccvpe_tpu.train.harness import Trainer

    cfg, _, _, batch = tiny_setup
    raw = jax.device_get(batch)
    tr = Trainer(cfg, results_dir=str(tmp_path / "results"), batch_size=8)
    tr.init_state(seed=9)
    loader = [dict(raw, orientation_from_north=np.linspace(0, 350, 8))]
    fn = lambda r: {k: v for k, v in r.items()
                    if k != "orientation_from_north"}
    dev = tr.evaluate(loader, fn, meter_per_pixel=2.0, with_heading=True)
    host = tr.evaluate(loader, fn, meter_per_pixel=2.0, with_heading=True,
                       device_readout=False)
    for k in dev:
        if k == "pairs_per_sec":
            continue
        assert abs(dev[k] - host[k]) < 1e-4 * max(1.0, abs(host[k])), (
            k, dev[k], host[k])


def test_remat_scope_typo_rejected(tiny_setup):
    """A typo'd remat scope must error, not silently disable remat."""
    import pytest

    cfg, opt, state, batch = tiny_setup
    step = train_loop.make_train_step(cfg, opt, remat="encoders")
    with pytest.raises(ValueError, match="remat"):
        jax.eval_shape(step, state, batch, jax.random.PRNGKey(0))


def test_eval_steps_use_trainer_matching_impl(monkeypatch):
    """Trainer(matching_impl=...) must reach BOTH eval-step builders, not
    just the train step (a user selecting --matching_impl for eval would
    otherwise silently benchmark einsum)."""
    from ccvpe_tpu.train import harness

    seen = {}
    orig_ro = train_loop.make_eval_readout_step
    orig_ev = train_loop.make_eval_step

    def spy_ro(cfg, loc_offsets=None, matching_impl="einsum"):
        seen["readout"] = matching_impl
        return orig_ro(cfg, loc_offsets, matching_impl=matching_impl)

    def spy_ev(cfg, loc_offsets=None, matching_impl="einsum"):
        seen["full"] = matching_impl
        return orig_ev(cfg, loc_offsets, matching_impl=matching_impl)

    monkeypatch.setattr(train_loop, "make_eval_readout_step", spy_ro)
    monkeypatch.setattr(train_loop, "make_eval_step", spy_ev)
    tr = harness.Trainer(cvm.NANO, matching_impl="reference",
                         results_dir="/tmp/unused")
    tr._get_eval_step(None, readout=True)   # jit is lazy: no compile here
    tr._get_eval_step(None, readout=False)
    assert seen == {"readout": "reference", "full": "reference"}


def test_trainer_rejects_microbatch_not_dividing_mesh():
    """batch % (mesh * grad_accum) != 0 must be rejected up front: a
    partially-replicated microbatch mis-reduces grouped-conv grads (see
    loop.py).  8 devices, batch 8, grad_accum 2 -> microbatches of 4."""
    from ccvpe_tpu.train.harness import Trainer

    with pytest.raises(ValueError, match="microbatch"):
        Trainer(cvm.NANO, mesh=mesh_lib.create_mesh(),  # explicit 8-dev mesh
                batch_size=8, grad_accum=2, results_dir="/tmp/unused")
    # the auto-fit path shrinks the data axis instead of raising
    tr = Trainer(cvm.NANO, batch_size=8, grad_accum=2,
                 results_dir="/tmp/unused")
    assert 8 % (len(tr.mesh.devices.flat) * 2) == 0


@pytest.mark.slow
def test_grad_accum_approximates_full_batch(tiny_setup):
    """grad_accum=N averages per-microbatch grads (torch-style accumulation:
    BN normalizes per microbatch, so parity with the single big batch is
    approximate, not bitwise); the step must run under jit, advance BN
    state, and land close to the full-batch update."""
    cfg, opt, state, batch = tiny_setup
    full = train_loop.make_train_step(cfg, opt)
    accum = train_loop.make_train_step(cfg, opt, grad_accum=2)
    rng = jax.random.PRNGKey(3)
    s_full, p_full = jax.jit(full)(state, batch, rng)
    s_acc, p_acc = jax.jit(accum)(state, batch, rng)
    assert int(s_acc.step) == 1
    for k in p_full:
        a, b = float(p_full[k]), float(p_acc[k])
        assert np.isfinite(b), k
        assert abs(a - b) < 0.15 * max(1.0, abs(a)), (k, a, b)
    # BN running stats advanced through both microbatches
    bn_delta = float(jnp.abs(
        s_acc.bn_state["sat_efficientnet"]["bn0"]["mean"]
        - state.bn_state["sat_efficientnet"]["bn0"]["mean"]).sum())
    assert bn_delta > 0
    # parameter updates are correlated (exact agreement is impossible:
    # microbatch BN statistics + per-microbatch drop-connect RNG perturb the
    # grads, and Adam's normalization amplifies that at random init —
    # measured delta cosine ~0.75 here)
    d_full = jax.tree_util.tree_map(lambda a, b: a - b, s_full.params,
                                    state.params)
    d_acc = jax.tree_util.tree_map(lambda a, b: a - b, s_acc.params,
                                   state.params)
    num = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(x),
        jax.tree_util.tree_map(lambda a, b: jnp.sum(a * b), d_full, d_acc),
        0.0)
    na = float(optax.global_norm(d_full))
    nb = float(optax.global_norm(d_acc))
    assert num / (na * nb) > 0.5, num / (na * nb)


def test_grad_accum_rejects_undividable_batch(tiny_setup):
    import pytest

    cfg, opt, state, batch = tiny_setup
    step = train_loop.make_train_step(cfg, opt, grad_accum=3)  # b=8
    with pytest.raises(ValueError, match="grad_accum"):
        jax.eval_shape(step, state, batch, jax.random.PRNGKey(0))


def test_empty_eval_accumulator_raises():
    """summary() on zero accumulated samples raises instead of silently
    writing NaN metrics into epoch results."""
    from ccvpe_tpu.train.metrics import PoseErrorAccumulator

    with pytest.raises(ValueError, match="zero accumulated"):
        PoseErrorAccumulator().summary()


def test_checkpoint_meta_sidecar(tmp_path):
    """CheckpointManager sidecar meta: written atomically with a save,
    trusted only when its step matches, upgradable in place (the
    end-of-epoch completed=True flip), and absent -> {} (pre-meta
    checkpoints fall back to epoch 0)."""
    from ccvpe_tpu.io.checkpoint import CheckpointManager

    ck = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    state = {"w": np.zeros((3,), np.float32)}
    assert ck.meta(1) == {}                      # nothing written yet
    ck.save(1, state, wait=True, meta={"epoch": 0, "completed": False})
    assert ck.meta(1) == {"step": 1, "epoch": 0, "completed": False}
    ck.save_meta(1, {"epoch": 0, "completed": True})
    assert ck.meta(1)["completed"] is True
    ck.save(2, state, wait=True, meta={"epoch": 1, "completed": True})
    assert ck.meta(1) == {}                      # stale step -> untrusted
    assert ck.meta(2)["epoch"] == 1
    ck.save(3, state, wait=True)                 # meta-less save
    assert ck.meta(3) == {}
    ck.close()
