"""Shared trainer/evaluator harness.

The reference duplicates its train loop across three scripts
(``train_VIGOR.py:109-241``, ``train_KITTI.py:104-277``,
``train_OxfordRobotCar.py:88-207``); here one harness drives any dataset:
prefetching host loader -> device batch assembly -> donated jitted train step,
with per-epoch checkpointing (full TrainState) and the reference's
results-file format (one scalar appended per epoch) plus JSON summaries.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..io.checkpoint import CheckpointManager
from ..parallel import mesh as mesh_lib
from . import loop as train_loop
from .metrics import PoseErrorAccumulator


def append_result(results_dir: str, name: str, epoch: int, value: float,
                  header: str):
    """np.savetxt-append format of the reference (``train_VIGOR.py:221-241``)."""
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, name), "ab") as f:
        np.savetxt(f, [value], fmt="%4f", header=header,
                   comments=f"{epoch}_")


class Trainer:
    def __init__(self, model_cfg, *, mesh=None, learning_rate: float = 1e-4,
                 weight_info_nce: float = 1e4, weight_ori: float = 1e1,
                 checkpoint_dir: str | None = None, results_dir: str = "results",
                 label: str = "run", log_every: int = 200, seed: int = 17,
                 batch_size: int | None = None, profile_dir: str | None = None,
                 compute_dtype: str = "float32", remat: bool | str = False,
                 checkpoint_every_steps: int = 0,
                 param_dtype: str = "float32",
                 matching_impl: str = "einsum",
                 n_model: int = 1,
                 keep_checkpoints: int | None = 3,
                 zero1: bool = False,
                 grad_accum: int = 1):
        """``n_model > 1`` reserves that many devices for the model axis:
        large weights and their optimizer moments are tensor-sharded via
        ``parallel.mesh.tree_shardings`` and GSPMD partitions the matmuls —
        hybrid data+tensor parallelism from any CLI (``--n_model``).

        ``zero1=True`` shards the optimizer state (Adam moments, f32
        master) over the data axis (``parallel.mesh.zero1_state_shardings``)
        — cuts per-device optimizer HBM traffic and residency ~n_data x on
        multi-chip meshes; no-op on a single device."""
        self.model_cfg = model_cfg
        if mesh is None:
            # the batch shards over the whole mesh (see mesh.data_sharded),
            # so data*model must divide the global batch
            n_dev = len(jax.devices())
            if n_model < 1 or n_dev % n_model:
                raise ValueError(
                    f"n_model={n_model} must be a positive divisor of the "
                    f"device count ({n_dev})")
            if batch_size and batch_size % n_model:
                raise ValueError(
                    f"global batch {batch_size} must be divisible by "
                    f"n_model={n_model} (the batch shards over the whole "
                    f"mesh)")
            n = n_dev // n_model
            if batch_size:
                # with grad accumulation each MICROBATCH must divide the
                # mesh too — a partially-replicated microbatch makes GSPMD
                # over-reduce grouped-conv weight grads (see loop.py)
                while n > 1 and batch_size % (n * n_model * grad_accum):
                    n -= 1
                if n * n_model < n_dev:
                    print(f"WARNING: global batch {batch_size} (grad_accum="
                          f"{grad_accum}) does not divide the "
                          f"{n_dev}-device slice; using a "
                          f"{n}x{n_model} mesh and idling "
                          f"{n_dev - n * n_model} device(s) — pick a batch "
                          f"divisible by devices*grad_accum for full "
                          f"utilization")
            mesh = mesh_lib.create_mesh(n_data=n, n_model=n_model)
        self.mesh = mesh
        if batch_size and grad_accum > 1:
            mesh_size = int(np.prod(list(dict(mesh.shape).values())))
            if batch_size % (mesh_size * grad_accum):
                raise ValueError(
                    f"global batch {batch_size} with grad_accum="
                    f"{grad_accum} leaves microbatches of "
                    f"{batch_size // grad_accum} that do not divide the "
                    f"{mesh_size}-device mesh; every microbatch must "
                    f"divide the mesh (batch % (mesh * grad_accum) == 0) "
                    f"or grouped-conv gradients mis-reduce")
        self.n_model = dict(mesh.shape).get(mesh_lib.MODEL_AXIS, 1)

        # bf16-resident params keep an f32 master in the optimizer state
        self.param_dtype = {"float32": None, "bfloat16": jnp.bfloat16}[
            param_dtype]
        self.optimizer = train_loop.make_optimizer(
            learning_rate, f32_master=self.param_dtype is not None)
        self.results_dir = results_dir
        self.label = label
        self.log_every = log_every
        self.rng = jax.random.PRNGKey(seed)


        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            compute_dtype]
        self.matching_impl = matching_impl
        self._step_fn = train_loop.make_train_step(
            model_cfg, self.optimizer, weight_info_nce=weight_info_nce,
            weight_ori=weight_ori, remat=remat, compute_dtype=dtype,
            matching_impl=matching_impl, grad_accum=grad_accum,
            mesh_size=self.mesh.size)
        # compiled lazily: TP state shardings depend on the state tree
        self._train_step = None
        self._state_shardings = None
        self._eval_steps: dict = {}

        # keep_checkpoints: retained checkpoint count; None/0 keeps every
        # step (the reference keeps all per-epoch torch.save files,
        # ``train_VIGOR.py:159-163``)
        self.ckpt = (CheckpointManager(checkpoint_dir,
                                       max_to_keep=keep_checkpoints or None)
                     if checkpoint_dir else None)
        self.state = None
        self.profile_dir = profile_dir
        self._profiled = False
        # preemption recovery: checkpoint mid-epoch every N steps (0 = per
        # epoch only, the reference's cadence)
        self.checkpoint_every_steps = checkpoint_every_steps
        self.zero1 = zero1
        self._global_step = 0
        # epoch to start the CLI loop at; resume() advances it from the
        # checkpoint's sidecar meta so preempted runs continue where they
        # left off instead of retraining from epoch 0
        self.start_epoch = 0

    # -- state ------------------------------------------------------------
    def _place_state(self, state):
        """Place a host-side TrainState on the mesh: replicated for pure DP,
        tensor-sharded over the model axis and/or ZeRO-1-sharded over the
        data axis otherwise."""
        if self.zero1:
            self._state_shardings = mesh_lib.zero1_state_shardings(
                state, self.mesh)
        elif self.n_model > 1:
            self._state_shardings = mesh_lib.tree_shardings(state, self.mesh)
        else:
            self._state_shardings = None
            self.state = mesh_lib.replicate(self.mesh, state)
            return self.state
        self.state = jax.tree_util.tree_map(jax.device_put, state,
                                            self._state_shardings)
        return self.state

    def init_state(self, seed: int = 17, pretrained_b0: str | None = None):
        state = train_loop.create_train_state(
            self.model_cfg, jax.random.PRNGKey(seed), self.optimizer,
            param_dtype=self.param_dtype, pretrained_b0=pretrained_b0)
        return self._place_state(state)

    def load_torch_checkpoint(self, path: str):
        from ..io.torch_import import load_state_dict

        state = train_loop.train_state_from_torch(load_state_dict(path),
                                                  self.optimizer,
                                                  param_dtype=self.param_dtype)
        return self._place_state(state)

    def _host_state(self):
        """Host copy of the TrainState for checkpointing.  Plain device_get
        works for replicated state but raises for ZeRO-1/TP shardings that
        span other hosts' devices; fetch_global gathers those."""
        return mesh_lib.fetch_global(self.state)

    def resume(self):
        if self.ckpt and self.ckpt.latest_step() is not None:
            if self.state is None:
                self.init_state()
            step = self.ckpt.latest_step()
            state = self.ckpt.restore(self._host_state())
            self._place_state(state)
            self._global_step = int(jax.device_get(self.state.step))
            # epoch position from the save's sidecar meta: a completed
            # epoch resumes at the next one; a mid-epoch save re-runs its
            # epoch from the start (loader shuffle order is epoch-keyed,
            # not step-restorable).  Pre-meta checkpoints resume at 0 —
            # the old (over-training) behavior, now the documented
            # fallback only.
            meta = self.ckpt.meta(step)
            self.start_epoch = (int(meta["epoch"]) + bool(meta.get("completed"))
                                if "epoch" in meta else 0)
            return True
        return False

    def _compiled_train_step(self):
        if self._train_step is None:
            self._train_step = train_loop.compile_train_step(
                self._step_fn, self.mesh,
                state_shardings=self._state_shardings)
        return self._train_step

    # -- train ------------------------------------------------------------
    def train_epoch(self, loader, device_batch_fn: Callable, epoch: int):
        """One pass over ``loader``.

        Exceeds the reference's per-epoch ``torch.save`` cadence
        (``train_VIGOR.py:159-163``): the global step advances every batch,
        mid-epoch checkpoints fire every ``checkpoint_every_steps`` (preemption
        recovery), and the end-of-epoch save is keyed by the true global step
        so epoch N restores as epoch N.  The running loss accumulates on
        device — the only host syncs are the ``log_every`` fetch and
        checkpoint writes, so dispatch stays pipelined.
        """
        assert self.state is not None, "call init_state() first"
        from ..utils.profiling import StepTimer

        train_step = self._compiled_train_step()
        timer = StepTimer()
        running, t0, n = None, time.time(), 0
        pairs = 0
        # trace steps 10-12 (past compile + warmup); short epochs trace from
        # step 0 so `--profile_dir` always produces a capture
        try:
            n_batches = len(loader)
        except TypeError:
            n_batches = None
        trace_start = 10 if (n_batches is None or n_batches > 13) else 0
        tracing = False
        parts = None
        # one-batch device-side lookahead: batch N+1's host assembly + H2D
        # transfer run in a producer thread while step N executes (async
        # dispatch overlaps the *dispatch*; this overlaps the numpy +
        # device_put work too, keeping the main thread free to dispatch)
        from ..data.pipeline import device_prefetch

        feed = device_prefetch(
            loader,
            lambda raw: mesh_lib.shard_batch(self.mesh,
                                             device_batch_fn(raw)))
        for i, batch in enumerate(feed):
            timer.start()
            if self.profile_dir and not self._profiled and i == trace_start:
                jax.profiler.start_trace(self.profile_dir)
                tracing = True
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, parts = train_step(self.state, batch, step_rng)
            if tracing and i == trace_start + 3:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), parts)
                jax.profiler.stop_trace()
                tracing = False
                self._profiled = True
            # device-side accumulation: no per-step device->host fetch
            loss = parts["loss"]
            running = loss if running is None else running + loss
            n += 1
            self._global_step += 1
            pairs += int(batch["gt"].shape[0])
            if (i + 1) % self.log_every == 0:
                avg = float(jax.device_get(running)) / n  # sync point
                dt = time.time() - t0
                print(f"[{epoch}, {i + 1:5d}] loss: {avg:.3f} "
                      f"({pairs / dt:.1f} pairs/s)")
                running, n = None, 0
            if (self.ckpt and self.checkpoint_every_steps and
                    self._global_step % self.checkpoint_every_steps == 0):
                self.ckpt.save(self._global_step, self._host_state(),
                               meta={"epoch": epoch, "completed": False})
            timer.stop()
        if tracing:
            # epoch ended inside the capture window: close the trace
            if parts is not None:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), parts)
            jax.profiler.stop_trace()
            self._profiled = True
        if self.ckpt:
            if self.ckpt.latest_step() != self._global_step:
                self.ckpt.save(self._global_step, self._host_state(),
                               wait=True,
                               meta={"epoch": epoch, "completed": True})
            else:
                # a mid-epoch save just landed on this exact step: keep the
                # array write, upgrade its meta to epoch-completed so resume
                # starts at the next epoch
                self.ckpt.save_meta(self._global_step,
                                    {"epoch": epoch, "completed": True})
        stats = timer.summary()
        if stats:
            # host-cadence times: most steps are async dispatch + data load;
            # the log_every/checkpoint steps absorb the device sync
            print(f"epoch {epoch} step time: p50 {stats['p50_ms']:.0f} ms "
                  f"p95 {stats['p95_ms']:.0f} ms over {stats['steps']} steps")
        return pairs / max(time.time() - t0, 1e-9)

    # -- eval -------------------------------------------------------------
    def _get_eval_step(self, loc_offsets, readout: bool = False):
        """``readout=True``: the forward is fused with the on-device pose
        readout (per-sample scalars out; the softmax heatmap is dead code
        inside the jit)."""
        key = (tuple(loc_offsets) if loc_offsets is not None else None,
               readout)
        if key not in self._eval_steps:
            sh = self._state_shardings
            kw = dict(
                params_sharding=sh.params if sh is not None else None,
                bn_sharding=sh.bn_state if sh is not None else None)
            if readout:
                fn = train_loop.make_eval_readout_step(
                    self.model_cfg, loc_offsets,
                    matching_impl=self.matching_impl)
                self._eval_steps[key] = train_loop.compile_eval_readout_step(
                    fn, self.mesh, **kw)
            else:
                fn = train_loop.make_eval_step(
                    self.model_cfg, loc_offsets,
                    matching_impl=self.matching_impl)
                self._eval_steps[key] = train_loop.compile_eval_step(
                    fn, self.mesh, **kw)
        return self._eval_steps[key]

    def evaluate(self, loader, device_batch_fn: Callable, *,
                 meter_per_pixel, loc_offsets=None, cities_to_mpp=None,
                 with_heading: bool = False,
                 device_readout: bool = True) -> dict:
        """Run a full eval pass; returns the metric summary dict.

        ``meter_per_pixel``: scalar, or None with ``cities_to_mpp`` to derive
        per-sample conversions from a batch 'city' field (VIGOR,
        reference ``train_VIGOR.py:193-200``).

        ``device_readout``: reduce each sample to pose scalars on device
        (``ops.readout``) instead of fetching full heatmaps — the streaming
        fast path; identical metrics.
        """
        assert self.state is not None
        step = self._get_eval_step(loc_offsets, readout=device_readout)
        acc = PoseErrorAccumulator()
        t0, pairs = time.time(), 0
        # double-buffered readout: fetch batch N's pose scalars while batch
        # N+1 computes, hiding the device->host round-trip behind compute
        pending = None

        def flush(p):
            nonlocal pairs
            r = mesh_lib.fetch_global(p)
            mpp_g, head_g = r.pop("mpp"), r.pop("heading")
            acc.update_from_readout(
                r, mpp_g,
                orientation_from_north=head_g if with_heading else None)
            pairs += int(mpp_g.shape[0])

        def side_fields(raw, b_local):
            if cities_to_mpp is not None:
                mpp_local = np.asarray(
                    [cities_to_mpp[c] for c in raw["city"]], np.float32)
            else:
                mpp_local = np.full(b_local, meter_per_pixel, np.float32)
            heading_local = (
                np.asarray(raw["orientation_from_north"], np.float32)
                if with_heading else np.zeros(b_local, np.float32))
            return mpp_local, heading_local

        if device_readout:
            # assemble the GLOBAL batch for every field the readout touches
            # (multi-host: each process contributes its local slice), reduce
            # to per-sample pose scalars inside the eval jit (softmax heatmap
            # never materializes), then fetch the small global result
            # everywhere.  Input assembly + H2D ride a one-batch lookahead
            # thread (device_prefetch) so they overlap the running forward;
            # the readout fetch is double-buffered below — both directions of
            # the host round-trip hide behind device compute.
            from ..data.pipeline import device_prefetch

            def prepare(raw):
                batch = device_batch_fn(raw)
                mpp_local, heading_local = side_fields(
                    raw, int(batch["gt"].shape[0]))
                return mesh_lib.shard_batch(
                    self.mesh, (batch["grd"], batch["sat"], batch["gt"],
                                batch["orientation"], mpp_local,
                                heading_local))

            for grd, sat, gt, omap, mpp_d, head_d in device_prefetch(
                    loader, prepare):
                r = dict(step(self.state.params, self.state.bn_state, grd,
                              sat, gt, omap),
                         mpp=mpp_d, heading=head_d)
                if pending is not None:
                    flush(pending)
                pending = r
            if pending is not None:
                flush(pending)
            summary = acc.summary()
            summary["pairs_per_sec"] = pairs / max(time.time() - t0, 1e-9)
            return summary

        for raw in loader:
            batch = device_batch_fn(raw)
            b_local = int(batch["gt"].shape[0])
            mpp_local, heading_local = side_fields(raw, b_local)
            if jax.process_count() > 1:
                # full-heatmap (debug/parity) path, multi-host.  Every field
                # rides the same global-array assembly as the model inputs,
                # so fetch_global materializes the complete global batch of
                # heatmaps on every process — bandwidth-heavy but exact; the
                # parity path works on pods too.
                grd, sat, gt_d, om_d, mpp_d, head_d = mesh_lib.shard_batch(
                    self.mesh, (batch["grd"], batch["sat"], batch["gt"],
                                batch["orientation"], mpp_local,
                                heading_local))
                out = step(self.state.params, self.state.bn_state, grd, sat)
                hm_g, ori_g, gt_g, om_g, mpp_g, head_g = \
                    mesh_lib.fetch_global(
                        (out.heatmap, out.ori, gt_d, om_d, mpp_d, head_d))
                acc.update(hm_g, gt_g[..., None], ori_g, om_g, mpp_g,
                           orientation_from_north=(
                               head_g if with_heading else None))
                pairs += int(mpp_g.shape[0])
            else:
                # full-heatmap path, single process: the metric side-fields
                # never need the device — use them directly instead of a
                # host->device->host round-trip through shard/fetch
                grd, sat = mesh_lib.shard_batch(
                    self.mesh, (batch["grd"], batch["sat"]))
                out = step(self.state.params, self.state.bn_state, grd, sat)
                acc.update(np.asarray(out.heatmap),
                           np.asarray(batch["gt"])[..., None],
                           np.asarray(out.ori),
                           np.asarray(batch["orientation"]), mpp_local,
                           orientation_from_north=(
                               heading_local if with_heading else None))
                pairs += b_local
        summary = acc.summary()
        summary["pairs_per_sec"] = pairs / max(time.time() - t0, 1e-9)
        return summary

    def write_epoch_results(self, epoch: int, summary: dict,
                            prefix: str = ""):
        # multi-host: every process computes identical metrics
        # (mesh.fetch_global); only process 0 writes, or a pod run appends
        # process_count duplicates of every line to shared storage
        if jax.process_index() != 0:
            return
        mapping = {
            "mean_distance_m": "mean_distance_error",
            "median_distance_m": "median_distance_error",
            "mean_orientation_deg": "mean_orientation_error",
            "median_orientation_deg": "median_orientation_error",
        }
        for key, stem in mapping.items():
            if key in summary:
                append_result(self.results_dir,
                              f"{self.label}_{prefix}{stem}.txt", epoch,
                              summary[key], f"{self.label}_{prefix}{stem}:")
        with open(os.path.join(self.results_dir,
                               f"{self.label}_{prefix}summary.json"),
                  "a") as f:
            f.write(json.dumps({"epoch": epoch, **summary}) + "\n")
