"""High-level inference API: load a model, estimate a pose.

The reference exposes pose estimation only through its training scripts;
this is the front door for serving:

    from ccvpe_tpu import api
    model = api.load_model("model.pt", preset="VIGOR")
    pose = model.predict(grd_image, sat_image, ori_noise=36.0)
    pose.row, pose.col, pose.orientation_deg, pose.probability

Images are uint8 RGB arrays (HWC) at any size; they are resized on host and
normalized on device.  The forward is jitted once per (preset, batch,
ori_noise) and reused — streaming per-frame estimation (the reference's
14 FPS Oxford configuration) is one `predict` per frame.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .data import transforms
from .models import cvm
from .ops.readout import pose_readout
from .train.metrics import angle_from_cos_sin


@dataclass
class Pose:
    row: int                 # heatmap argmax (pixels, aerial frame)
    col: int
    orientation_deg: float   # heading from north (reference convention)
    probability: float       # heatmap mass at the estimated location
    heatmap: np.ndarray | None = None   # [H, W] if return_heatmap


def _ori_noise_to_n(ori_noise: float) -> int | None:
    """Reference rounding (``train_VIGOR.py:49``): prior of ±n bins of 18°,
    None = unknown orientation (all bins)."""
    if ori_noise >= 180:
        return None
    return int(ori_noise // 18)


def _poses_from_readout(r, batch: int, return_heatmap: bool) -> list[Pose]:
    poses = []
    for i in range(batch):
        ang, valid = angle_from_cos_sin(r["cos"][i], r["sin"][i])
        poses.append(Pose(
            row=int(r["row"][i]), col=int(r["col"][i]),
            orientation_deg=float(ang) if valid else float("nan"),
            probability=float(r["prob"][i]),
            heatmap=np.asarray(r["heatmap"][i]) if return_heatmap else None))
    return poses


class CVMModel:
    def __init__(self, cfg: cvm.CVMConfig, params, bn_state,
                 matching_impl: str = "einsum", mesh=None):
        """``mesh``: a ``jax.sharding.Mesh`` (or ``mesh="data"`` for an
        all-devices data mesh) shards ``predict_batch`` inputs over the
        devices — multi-chip serving throughput scales linearly; the batch
        size must be a multiple of the device count (otherwise the batch
        falls back to replicated placement).  Default: single-device jit."""
        self.cfg = cfg
        self.matching_impl = matching_impl
        if mesh == "data":
            from .parallel import mesh as mesh_lib

            mesh = mesh_lib.create_mesh()
        self.mesh = mesh
        if mesh is not None:
            from .parallel import mesh as mesh_lib

            self.params, self.bn_state = mesh_lib.replicate(
                mesh, (params, bn_state))
        else:
            self.params, self.bn_state = params, bn_state
        self._compiled: dict = {}

    def _forward(self, n_bins_offsets, circular: bool | None = None,
                 want_heatmap: bool = True):
        circular = self.cfg.circular if circular is None else circular
        key = (n_bins_offsets, circular, want_heatmap)
        if key not in self._compiled:
            offsets = (tuple(range(self.cfg.bins)) if n_bins_offsets is None
                       else tuple(range(-n_bins_offsets, n_bins_offsets + 1)))
            cfg = (self.cfg if circular == self.cfg.circular
                   else dataclasses.replace(self.cfg, circular=circular))

            @jax.jit
            def fwd(params, state, grd, sat):
                out, _ = cvm.forward(cfg, params, state, grd, sat,
                                     train=False, loc_offsets=offsets,
                                     matching_impl=self.matching_impl)
                idx = jnp.arange(out.heatmap.shape[0])
                if want_heatmap:
                    hm = out.heatmap[..., 0]
                    flat = jnp.argmax(hm.reshape(hm.shape[0], -1), axis=1)
                    pr = flat // hm.shape[2]
                    pc = flat % hm.shape[2]
                    prob = hm[idx, pr, pc]
                else:
                    # softmax is monotonic: argmax(logits) == argmax(heatmap)
                    # and the probability at the argmax is
                    # exp(l_max - logsumexp(l)) — the full 512^2 heatmap is
                    # never materialized (XLA dead-code-eliminates it)
                    logits = out.logits_flattened
                    w = out.heatmap.shape[2]
                    flat = jnp.argmax(logits, axis=1)
                    pr, pc = flat // w, flat % w
                    lse = jax.scipy.special.logsumexp(
                        logits.astype(jnp.float32), axis=1)
                    prob = jnp.exp(
                        logits[idx, flat].astype(jnp.float32) - lse)
                res = {
                    "row": pr, "col": pc, "prob": prob,
                    "cos": out.ori[idx, pr, pc, 0],
                    "sin": out.ori[idx, pr, pc, 1],
                }
                if want_heatmap:
                    res["heatmap"] = hm
                return res

            self._compiled[key] = fwd
        return self._compiled[key]

    def predict_batch(self, grd: np.ndarray, sat: np.ndarray, *,
                      ori_noise: float = 180.0, fov: float = 360.0,
                      return_heatmap: bool = False) -> list[Pose]:
        """grd [B,H,W,3] uint8 (already model-sized), sat [B,H,W,3] uint8.

        ``fov < 360`` is the limited-HFoV eval mode (BASELINE config 3,
        reference ``train_VIGOR.py:272-273``): the panorama is cropped to the
        leading ``fov/360`` width fraction and the ground encoder runs
        without circular padding (its input no longer wraps)."""
        circular = None
        if fov < 360:
            w = int(grd.shape[2] * fov / 360) if (
                grd.shape[2] == self.cfg.grd_hw[1]) else grd.shape[2]
            grd = grd[:, :, :w]
            circular = False
        fwd = self._forward(_ori_noise_to_n(ori_noise), circular,
                            want_heatmap=return_heatmap)
        g = transforms.normalize_images(jnp.asarray(grd))
        s = transforms.normalize_images(jnp.asarray(sat))
        if self.mesh is not None and g.shape[0] % self.mesh.size == 0:
            # batches that don't divide the mesh (e.g. single-pair predict)
            # fall back to replicated placement
            from .parallel import mesh as mesh_lib

            g, s = mesh_lib.shard_batch(self.mesh, (g, s))
        r = jax.device_get(fwd(self.params, self.bn_state, g, s))
        return _poses_from_readout(r, grd.shape[0], return_heatmap)

    def quantize_int8(self, calib: Sequence[tuple] | None = None, *,
                      ori_noise: float = 180.0,
                      select: str = "all") -> "CVMModel":
        """Post-training int8 quantization of this model, in place.

        Rewrites the conv weights to per-channel int8 with calibrated
        static activation scales (``nn.quant``); subsequent ``predict`` /
        ``predict_batch`` calls run the MXU's 2x-rate int8 conv path.
        Inference-only — ``save_torch`` requires the float tree (the
        reference checkpoint format has no int8 representation), so
        quantize a serving copy, not your training model.  ``export_model``
        does work on a quantized model: the StableHLO artifact then carries
        the int8 forward and the pickled int8 weights.

        ``calib``: iterable of (grd, sat) uint8 image batches at model size
        used to record activation ranges; defaults to one synthetic batch
        (prefer a handful of real samples for deployment).

        ``select``: conv selection policy — ``"all"`` (every non-depthwise
        conv, the default) or ``"mxu"``/``"mxu:<threshold>"`` (only
        compute-bound convs, ``nn.quant.mxu_bound_select``).  Measured end
        to end on the v5e (``benchmarks/QUANT_BENCH.json``): int8 beats
        bf16 — ``all`` +12.8% in steady-state batch throughput (1401 vs
        1242 pairs/s) and +2.6% per dispatch; the ``mxu`` policies land
        within a few %, with ``mxu:120`` best per dispatch (+6.7%).  The
        default stays ``all`` (fastest steady state, simplest contract);
        see ARCHITECTURE.md "Lower precision".
        """
        from .nn import quant

        if quant.quantized_fraction(self.params) > 0:
            raise ValueError(
                "model is already int8-quantized; re-quantizing would "
                "recalibrate on int8 codes and corrupt the scales")
        if calib is None:
            rng = np.random.default_rng(0)
            calib = [(rng.integers(0, 256, (2, *self.cfg.grd_hw, 3),
                                   dtype=np.uint8),
                      rng.integers(0, 256, (2, *self.cfg.sat_hw, 3),
                                   dtype=np.uint8))]
        n = _ori_noise_to_n(ori_noise)
        offsets = (tuple(range(self.cfg.bins)) if n is None
                   else tuple(range(-n, n + 1)))
        bn_state = self.bn_state

        def fwd(p, g, s):
            out, _ = cvm.forward(self.cfg, p, bn_state, g, s, train=False,
                                 loc_offsets=offsets,
                                 matching_impl=self.matching_impl)
            return out.logits_flattened

        batches = [(transforms.normalize_images(jnp.asarray(g)),
                    transforms.normalize_images(jnp.asarray(s)))
                   for g, s in calib]
        ranges = quant.calibrate(fwd, self.params, batches)
        qparams = quant.quantize_params(jax.device_get(self.params), ranges,
                                        select=quant.resolve_select(select))
        if self.mesh is not None:
            from .parallel import mesh as mesh_lib

            qparams = mesh_lib.replicate(self.mesh, qparams)
        else:
            # commit the whole tree to the device NOW: quantize_params
            # leaves non-selected conv weights as the host-numpy copies it
            # quantized from, and uncommitted leaves re-upload host->device
            # on EVERY dispatch (measured 12-25x per-call slowdown,
            # benchmarks/QUANT_BENCH.json round 5)
            qparams = jax.device_put(qparams)
        self.params = qparams
        self._compiled.clear()
        return self

    def save_torch(self, path: str):
        """Write a reference-format torch checkpoint of this model's weights
        (``io.torch_import.save_torch_checkpoint``) — train/fine-tune here,
        evaluate or visualize with reference-ecosystem tooling."""
        from .io.torch_import import save_torch_checkpoint
        from .nn.quant import quantized_fraction

        if quantized_fraction(self.params) > 0:
            raise ValueError(
                "cannot write an int8-quantized model to a torch "
                "checkpoint — quantized trees are inference-only; keep the "
                "float model for torch export (see quantize_int8 docstring)")
        save_torch_checkpoint(path, jax.device_get(self.params),
                              jax.device_get(self.bn_state))

    def predict(self, grd: np.ndarray, sat: np.ndarray, *,
                ori_noise: float = 180.0, fov: float = 360.0,
                return_heatmap: bool = False) -> Pose:
        """Single query-aerial pair; images any size (resized on host).

        ``grd`` is always the full panorama; with ``fov < 360`` it is cropped
        to the leading ``fov/360`` width fraction after the resize, exactly
        like the reference eval (``train_VIGOR.py:272-273``)."""
        grd = _prepare(grd, self.cfg.grd_hw)
        sat = _prepare(sat, self.cfg.sat_hw)
        return self.predict_batch(grd[None], sat[None], ori_noise=ori_noise,
                                  fov=fov,
                                  return_heatmap=return_heatmap)[0]


def _prepare(img: np.ndarray, hw) -> np.ndarray:
    img = np.asarray(img, np.uint8)
    if img.shape[:2] != tuple(hw):
        from PIL import Image

        img = np.asarray(Image.fromarray(img).resize((hw[1], hw[0]),
                                                     Image.BILINEAR))
    return img


def export_model(model: CVMModel, path: str, *, batch: int | str = 1,
                 ori_noise: float = 180.0,
                 platforms: Sequence[str] | None = None) -> None:
    """Serialize the inference computation for deployment.

    Writes a directory with the ``jax.export`` StableHLO artifact of the
    jitted pose forward (params as inputs) plus the weights.  The artifact
    is loadable without this package's model code — the serving host only
    needs jax (``load_exported``).

    ``batch``: a fixed batch size, or ``"dynamic"`` to export with a
    symbolic batch dimension — one artifact serves any batch size (each
    distinct size still compiles once on the serving host).

    ``platforms``: lowering platforms, e.g. ``("tpu", "cpu")`` for an
    artifact that runs on both; defaults to the current backend.

    The export always lowers the einsum matching path — it is numerically
    identical to (and end-to-end faster than) the Pallas kernel, and the
    kernel cannot lower for non-TPU platforms.
    """
    import os
    import pickle

    from jax import export as jexport

    src = (model if model.matching_impl == "einsum"
           else CVMModel(model.cfg, model.params, model.bn_state))
    fwd = src._forward(_ori_noise_to_n(ori_noise))

    cfg = model.cfg
    b = jexport.symbolic_shape("b")[0] if batch == "dynamic" else batch
    spec = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    arg_specs = (
        jax.tree_util.tree_map(
            lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), model.params),
        jax.tree_util.tree_map(
            lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), model.bn_state),
        spec((b, *cfg.grd_hw, 3)),
        spec((b, *cfg.sat_hw, 3)),
    )
    exp = jexport.export(fwd, platforms=platforms)(*arg_specs)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "forward.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    with open(os.path.join(path, "weights.pkl"), "wb") as f:
        pickle.dump(jax.device_get((model.params, model.bn_state)), f)
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump({"preset_grd_hw": cfg.grd_hw, "preset_sat_hw": cfg.sat_hw,
                     "batch": batch, "ori_noise": ori_noise}, f)


class ExportedModel:
    """A deserialized export: fixed-batch pose inference, no model code."""

    def __init__(self, path: str):
        import os
        import pickle

        from jax import export as jexport

        with open(os.path.join(path, "forward.stablehlo"), "rb") as f:
            self._exported = jexport.deserialize(bytearray(f.read()))
        with open(os.path.join(path, "weights.pkl"), "rb") as f:
            self.params, self.bn_state = pickle.load(f)
        with open(os.path.join(path, "meta.pkl"), "rb") as f:
            self.meta = pickle.load(f)
        self._call = jax.jit(self._exported.call)

    def predict_batch(self, grd: np.ndarray, sat: np.ndarray,
                      *, return_heatmap: bool = False) -> list[Pose]:
        want = self.meta["batch"]
        if want != "dynamic" and grd.shape[0] != want:
            raise ValueError(
                f"this export is fixed to batch={want}; "
                f"got {grd.shape[0]} images (re-export with batch="
                f"{grd.shape[0]} or batch='dynamic', or pad the batch)")
        g = transforms.normalize_images(jnp.asarray(grd))
        s = transforms.normalize_images(jnp.asarray(sat))
        r = jax.device_get(self._call(self.params, self.bn_state, g, s))
        return _poses_from_readout(r, grd.shape[0], return_heatmap)


def load_exported(path: str) -> ExportedModel:
    """Load a directory written by ``export_model``."""
    return ExportedModel(path)


def load_model(checkpoint_path: str | None = None, preset: str = "VIGOR",
               seed: int = 0, matching_impl: str = "einsum",
               mesh=None) -> CVMModel:
    """Build a model from a torch checkpoint (.pt), an orbax directory, or
    random init (checkpoint_path=None).

    ``matching_impl``: 'einsum' (default) or 'pallas' (fused TPU kernel with
    the decoder-stage epilogue; falls back to the interpreter off-TPU).

    ``mesh``: ``"data"`` (or a ``jax.sharding.Mesh``) shards batched
    inference over all local devices — multi-chip serving."""
    cfg = cvm.PRESETS[preset]
    if checkpoint_path is None:
        params, bn_state = cvm.init(jax.random.PRNGKey(seed), cfg)
    elif checkpoint_path.endswith(".pt"):
        from .io.torch_import import import_cvm, load_state_dict

        params, bn_state = import_cvm(load_state_dict(checkpoint_path))
    else:
        from .io.checkpoint import CheckpointManager
        from .train import loop as train_loop

        # checkpoints from --bf16_params runs have bf16 param leaves and a
        # MasterState opt_state; inspect the saved metadata to pick the
        # matching TrainState template (orbax restores into the template's
        # tree, so a wrong guess raises a structure mismatch)
        def template(bf16: bool):
            if bf16:
                return train_loop.create_train_state(
                    cfg, jax.random.PRNGKey(0),
                    train_loop.make_optimizer(f32_master=True),
                    param_dtype=jnp.bfloat16)
            return train_loop.create_train_state(
                cfg, jax.random.PRNGKey(0), train_loop.make_optimizer())

        mgr = CheckpointManager(checkpoint_path)
        order = [False, True]
        try:
            leaves = jax.tree_util.tree_leaves(mgr.metadata())
            if any(getattr(m, "dtype", None) == jnp.bfloat16 for m in leaves):
                order = [True, False]
        except Exception:  # noqa: BLE001 — fall back to trying both
            pass
        state, errs = None, []
        for bf16 in order:
            try:
                state = mgr.restore(template(bf16))
                break
            except Exception as e:  # noqa: BLE001 — structure mismatch
                errs.append(e)
        if state is None:
            # the last error is the one from the metadata-preferred template
            # order's final attempt; chain the first so a genuinely corrupt
            # checkpoint surfaces its true cause, not a template mismatch
            raise errs[-1] from (errs[0] if len(errs) > 1 else None)
        params, bn_state = state.params, state.bn_state
    return CVMModel(cfg, params, bn_state, matching_impl=matching_impl,
                    mesh=mesh)
