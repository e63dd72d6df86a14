"""Jitted train/eval steps with mesh data parallelism.

Replaces the reference's hand-rolled per-script loops
(``train_VIGOR.py:109-150`` and copies): one donated, jitted ``train_step``
(forward + 8-term loss + Adam update + BN running-stat update) compiled once
per config, with the global batch sharded over the mesh's data axis.  Under
jit-over-mesh the semantics are global: BatchNorm statistics and loss
normalizers see the full logical batch, and XLA inserts the gradient
all-reduce over ICI.
"""

from __future__ import annotations


from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import cvm
from ..parallel import mesh as mesh_lib
from . import losses


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    bn_state: Any
    opt_state: Any


class MasterState(NamedTuple):
    master: Any
    inner: Any


def with_f32_master(inner) -> optax.GradientTransformation:
    """Keep float32 master weights inside the optimizer state so the resident
    params can live in bfloat16 (halving per-step weight HBM reads).

    ``update`` casts incoming grads to f32, steps the inner optimizer against
    the master copy, and emits f32 updates such that
    ``optax.apply_updates`` (p + u in f32, cast back to ``p.dtype``) rounds
    the resident params to the new master.
    """

    def init_fn(params):
        master = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32), params)
        return MasterState(master, inner.init(master))

    def update_fn(grads, state, params):
        g32 = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads)
        updates, new_inner = inner.update(g32, state.inner, state.master)
        new_master = optax.apply_updates(state.master, updates)
        out = jax.tree_util.tree_map(
            lambda m, p: m - p.astype(jnp.float32), new_master, params)
        return out, MasterState(new_master, new_inner)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate: float = 1e-4, b1: float = 0.9,
                   b2: float = 0.999, f32_master: bool = False):
    """Adam with the reference's hyperparameters (``train_VIGOR.py:104``).

    ``f32_master=True`` wraps the optimizer for bf16-resident params (see
    ``with_f32_master``); pair with ``param_dtype=jnp.bfloat16`` in
    ``create_train_state``.
    """
    opt = optax.adam(learning_rate, b1=b1, b2=b2)
    return with_f32_master(opt) if f32_master else opt


def _cast_params(params, param_dtype):
    if param_dtype is None:
        return params
    return jax.tree_util.tree_map(
        lambda p: p.astype(param_dtype), params)


def _check_encoder_shapes(init_tree, imported_tree, spec, model_cfg):
    """Fail fast, with a nameable mismatch, when pretrained encoder weights
    don't fit the configured model (e.g. a full B0 file into the shrunken
    TINY/NANO test presets) — otherwise the bad shapes only explode later
    inside the jitted step as an opaque conv error."""
    init_leaves = jax.tree_util.tree_leaves_with_path(init_tree)
    imp_leaves = jax.tree_util.tree_leaves_with_path(imported_tree)
    init_shapes = {jax.tree_util.keystr(k): v.shape for k, v in init_leaves}
    imp_shapes = {jax.tree_util.keystr(k): v.shape for k, v in imp_leaves}
    bad = [f"{k}: model wants {init_shapes.get(k)} but file has "
           f"{imp_shapes.get(k)}"
           for k in sorted(set(init_shapes) | set(imp_shapes))
           if init_shapes.get(k) != imp_shapes.get(k)]
    if bad:
        raise ValueError(
            f"pretrained weights {spec!r} do not match the configured "
            f"encoder (preset {getattr(model_cfg, 'name', model_cfg)!r}): "
            + "; ".join(bad[:3])
            + (f"; … {len(bad) - 3} more" if len(bad) > 3 else ""))


def create_train_state(model_cfg: cvm.CVMConfig, rng, optimizer,
                       dtype=jnp.float32, param_dtype=None,
                       pretrained_b0: str | None = None) -> TrainState:
    """``param_dtype`` (e.g. ``jnp.bfloat16``) sets the resident param dtype;
    the optimizer is initialized on the full-precision params first so an
    ``f32_master`` wrapper captures the unrounded master copy.

    ``pretrained_b0``: a raw EfficientNet-B0 torch state_dict (the
    lukemelas release file) — a local path, or ``auto``/``efficientnet-bN``
    to fetch through the verified download cache (``io/pretrained.py``);
    both encoders start from it — the reference's
    ``EfficientNet.from_pretrained`` training init
    (``models.py:55,99``, ``efficientnet_pytorch/utils.py:729-762``; the
    classifier head ``_fc.*`` is unused, matching ``load_fc=False``).
    """
    params, bn_state = cvm.init(rng, model_cfg, dtype)
    if pretrained_b0 is not None:
        from ..io.pretrained import resolve
        from ..io.torch_import import import_b0, load_state_dict

        sd = load_state_dict(resolve(pretrained_b0))
        # one conversion, shared by both encoders (jnp trees are immutable)
        imported = import_b0(sd)
        for enc in ("grd_efficientnet", "sat_efficientnet"):
            _check_encoder_shapes(params[enc], imported[0], pretrained_b0,
                                  model_cfg)
            params[enc], bn_state[enc] = imported
    opt_state = optimizer.init(params)
    return TrainState(jnp.zeros((), jnp.int32),
                      _cast_params(params, param_dtype), bn_state, opt_state)


def train_state_from_torch(state_dict, optimizer,
                           param_dtype=None) -> TrainState:
    """Resume training from an imported reference checkpoint."""
    from ..io.torch_import import import_cvm

    params, bn_state = import_cvm(state_dict)
    opt_state = optimizer.init(params)
    return TrainState(jnp.zeros((), jnp.int32),
                      _cast_params(params, param_dtype), bn_state, opt_state)


def make_train_step(model_cfg: cvm.CVMConfig, optimizer, *,
                    weight_info_nce: float = 1e4, weight_ori: float = 1e1,
                    remat: bool | str = False, compute_dtype=jnp.float32,
                    matching_impl: str = "einsum", grad_accum: int = 1,
                    mesh_size: int = 1):
    """Build the jittable train step.

    batch dict (NHWC): grd, sat, gt [B,H,W], bin_weights [B,bins],
    orientation [B,H,W,2]  (factored GT; see losses.total_loss).

    ``remat`` rematerializes the forward in the backward pass
    (``jax.checkpoint``), trading FLOPs for activation memory — the lever for
    scaling per-chip batch on HBM-limited chips.  ``True``/``"all"``
    checkpoints every block and stage; ``"encoder"``/``"decoder"`` restrict
    the scope (see ``models.cvm.forward``).

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16
    (f32 master weights and f32 loss math; ~1.5x step throughput on v5e).

    ``grad_accum=N`` splits the batch into N microbatches inside a
    ``lax.scan`` and applies Adam once on the averaged gradients: activation
    peak is that of ONE microbatch, so effective batches beyond the HBM
    wall (B=128 on v5e, see ARCHITECTURE.md) train without multi-chip.
    Matches torch-style accumulation loops: BatchNorm normalizes per
    microbatch (running stats chain through all N), so numerics are
    microbatch-BN semantics, not single-big-batch BN.  Microbatches are
    STRIDED slices of the batch (sample i -> microbatch i % N), which keeps
    each microbatch fully sharded over the mesh's data axis (see the
    in-body comment for the GSPMD grouped-conv gradient hazard this
    avoids).
    """

    def one_grad(params, bn_state, mb, rng):
        def loss_fn(params):
            # remat at MBConv-block / decoder-stage granularity (whole-
            # forward checkpointing would not reduce the backward peak)
            out, new_bn = cvm.forward(model_cfg, params, bn_state,
                                      mb["grd"].astype(compute_dtype),
                                      mb["sat"].astype(compute_dtype),
                                      train=True, rng=rng, remat=remat,
                                      matching_impl=matching_impl)
            loss, parts = losses.total_loss(
                out, mb["gt"], mb["bin_weights"], mb["orientation"],
                weight_info_nce=weight_info_nce, weight_ori=weight_ori)
            return loss, (new_bn, parts)

        return jax.grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch, rng):
        if grad_accum == 1:
            grads, (new_bn, parts) = one_grad(state.params, state.bn_state,
                                              batch, rng)
        else:
            b = batch["gt"].shape[0]
            if b % grad_accum:
                raise ValueError(f"batch {b} must be divisible by "
                                 f"grad_accum={grad_accum}")
            # trace-time guard (shapes are static under jit, so this fires
            # for ANY caller, not just CLIs that pass batch_size up front):
            # a microbatch that does not divide the mesh ends up partially
            # replicated and GSPMD over-reduces grouped-conv weight grads
            # (see the strided-composition comment below)
            if mesh_size > 1 and (b // grad_accum) % mesh_size:
                raise ValueError(
                    f"microbatch {b // grad_accum} (batch {b} / grad_accum="
                    f"{grad_accum}) does not divide the {mesh_size}-device "
                    f"mesh; grouped-conv gradients would mis-reduce — use a "
                    f"batch with batch % (mesh * grad_accum) == 0")
            # STRIDED microbatch composition (sample i -> microbatch
            # i % grad_accum): the [b//accum, accum] reshape keeps the
            # sharded batch axis intact, so each microbatch stays fully
            # sharded over the data axis.  Contiguous chunking (reshape to
            # [accum, micro, ...]) splits the sharded axis instead, leaving
            # every microbatch partially REPLICATED across device pairs —
            # and GSPMD then over-reduces grouped-conv weight gradients
            # (measured: depthwise grads exactly 2x too large on a 4-way
            # mesh; same pathology as the batch-replication note in
            # parallel/mesh.py::data_sharded).
            #
            # The gather happens INSIDE the scan body with a loop-dependent
            # index: pre-stacking the microbatches ([accum, micro, ...]
            # transpose outside the scan) materializes a full transposed
            # copy of the batch — and XLA then hoists the bf16 input casts
            # onto it too — ~1.2 GB of extra HBM temps at B=256 that pushed
            # the accum=2 step over the v5e's HBM (measured round 4).  With
            # the in-body dynamic slice only ONE microbatch is alive per
            # iteration, and the loop-variant index blocks the hoist.
            def pick(j, x):
                v = x.reshape(b // grad_accum, grad_accum, *x.shape[1:])
                return jax.lax.dynamic_index_in_dim(v, j, axis=1,
                                                    keepdims=False)

            rngs = jax.random.split(rng, grad_accum)
            # abstract-eval one microbatch to learn the grad dtypes and the
            # loss-parts structure (keeps this path in sync with whatever
            # losses.total_loss returns; accumulation itself stays f32)
            mb0 = jax.tree_util.tree_map(lambda x: pick(0, x), batch)
            g_tmpl, (_, parts_tmpl) = jax.eval_shape(
                one_grad, state.params, state.bn_state, mb0, rngs[0])

            def body(carry, xs):
                bn, gsum, lsum = carry
                j, r = xs
                mb = jax.tree_util.tree_map(lambda x: pick(j, x), batch)
                g, (new_bn, parts) = one_grad(state.params, bn, mb, r)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                lsum = jax.tree_util.tree_map(jnp.add, lsum, parts)
                return (new_bn, gsum, lsum), None

            g0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, jnp.float32), g_tmpl)
            l0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, jnp.float32), parts_tmpl)
            (new_bn, gsum, lsum), _ = jax.lax.scan(
                body, (state.bn_state, g0, l0),
                (jnp.arange(grad_accum), rngs))
            grads = jax.tree_util.tree_map(
                lambda g, s: (g / grad_accum).astype(s.dtype), gsum, g_tmpl)
            parts = jax.tree_util.tree_map(
                lambda v: v / grad_accum, lsum)
        parts["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_bn, new_opt), parts

    return train_step


def make_eval_step(model_cfg: cvm.CVMConfig, loc_offsets=None,
                   matching_impl: str = "einsum"):
    """Eval forward (BN in inference mode, optional orientation prior)."""

    def eval_step(params, bn_state, grd, sat):
        out, _ = cvm.forward(model_cfg, params, bn_state, grd, sat,
                             train=False, loc_offsets=loc_offsets,
                             matching_impl=matching_impl)
        return out

    return eval_step


def make_eval_readout_step(model_cfg: cvm.CVMConfig, loc_offsets=None,
                           matching_impl: str = "einsum"):
    """Eval forward fused with the on-device pose readout: returns the
    per-sample scalar dict directly, and because the readout works from raw
    logits, the 512x512 softmax heatmap is dead code inside the jit."""
    from ..ops.readout import pose_readout_from_outputs

    def eval_step(params, bn_state, grd, sat, gt, omap):
        out, _ = cvm.forward(model_cfg, params, bn_state, grd, sat,
                             train=False, loc_offsets=loc_offsets,
                             matching_impl=matching_impl)
        return pose_readout_from_outputs(out, gt, omap)

    return eval_step


def compile_eval_readout_step(eval_step, mesh, params_sharding=None,
                              bn_sharding=None):
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.data_sharded(mesh)
    return jax.jit(eval_step,
                   in_shardings=(params_sharding or repl,
                                 bn_sharding or repl, data, data, data,
                                 data),
                   out_shardings=data)


def compile_train_step(train_step, mesh, donate: bool = True,
                       state_shardings=None):
    """Jit a train step over a mesh.

    Default layout: state replicated, batch sharded over the data axis (pure
    DP).  Pass ``state_shardings`` (e.g. from
    ``parallel.mesh.tree_shardings``) for hybrid data+tensor parallelism —
    large weights and their optimizer moments sharded over the model axis.
    """
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.data_sharded(mesh)
    state_sh = repl if state_shardings is None else state_shardings
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def compile_eval_step(eval_step, mesh, params_sharding=None,
                      bn_sharding=None):
    """Pass ``params_sharding``/``bn_sharding`` (pytrees of NamedShardings,
    e.g. the TP layout from ``parallel.mesh.tree_shardings``) so eval reuses
    the training placement instead of re-replicating sharded weights."""
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.data_sharded(mesh)
    return jax.jit(eval_step,
                   in_shardings=(params_sharding or repl,
                                 bn_sharding or repl, data, data),
                   out_shardings=data)
