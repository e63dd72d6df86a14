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


def make_optimizer(learning_rate: float = 1e-4, b1: float = 0.9,
                   b2: float = 0.999):
    """Adam with the reference's hyperparameters (``train_VIGOR.py:104``)."""
    return optax.adam(learning_rate, b1=b1, b2=b2)


def create_train_state(model_cfg: cvm.CVMConfig, rng, optimizer,
                       dtype=jnp.float32) -> TrainState:
    params, bn_state = cvm.init(rng, model_cfg, dtype)
    return TrainState(jnp.zeros((), jnp.int32), params, bn_state,
                      optimizer.init(params))


def train_state_from_torch(state_dict, optimizer) -> TrainState:
    """Resume training from an imported reference checkpoint."""
    from ..io.torch_import import import_cvm

    params, bn_state = import_cvm(state_dict)
    return TrainState(jnp.zeros((), jnp.int32), params, bn_state,
                      optimizer.init(params))


def make_train_step(model_cfg: cvm.CVMConfig, optimizer, *,
                    weight_info_nce: float = 1e4, weight_ori: float = 1e1,
                    remat: bool = False, compute_dtype=jnp.float32):
    """Build the jittable train step.

    batch dict (NHWC): grd, sat, gt [B,H,W], bin_weights [B,bins],
    orientation [B,H,W,2]  (factored GT; see losses.total_loss).

    ``remat=True`` rematerializes the forward in the backward pass
    (``jax.checkpoint``), trading FLOPs for activation memory — the lever for
    scaling per-chip batch on HBM-limited chips.

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16
    (f32 master weights and f32 loss math; ~1.5x step throughput on v5e).
    """

    def train_step(state: TrainState, batch, rng):
        def fwd(params, grd, sat):
            # remat at MBConv-block / decoder-stage granularity (whole-
            # forward checkpointing would not reduce the backward peak)
            return cvm.forward(model_cfg, params, state.bn_state,
                               grd.astype(compute_dtype),
                               sat.astype(compute_dtype),
                               train=True, rng=rng, remat=remat)

        def loss_fn(params):
            out, new_bn = fwd(params, batch["grd"], batch["sat"])
            loss, parts = losses.total_loss(
                out, batch["gt"], batch["bin_weights"], batch["orientation"],
                weight_info_nce=weight_info_nce, weight_ori=weight_ori)
            return loss, (new_bn, parts)

        grads, (new_bn, parts) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_bn, new_opt), parts

    return train_step


def make_eval_step(model_cfg: cvm.CVMConfig, loc_offsets=None):
    """Eval forward (BN in inference mode, optional orientation prior)."""

    def eval_step(params, bn_state, grd, sat):
        out, _ = cvm.forward(model_cfg, params, bn_state, grd, sat,
                             train=False, loc_offsets=loc_offsets)
        return out

    return eval_step


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


def compile_eval_step(eval_step, mesh):
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.data_sharded(mesh)
    return jax.jit(eval_step, in_shardings=(repl, repl, data, data),
                   out_shardings=data)
