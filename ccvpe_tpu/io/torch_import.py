"""PyTorch state_dict -> JAX param-tree importer.

Maps the reference checkpoints (released CCVPE models saved via
``torch.save(model.state_dict())``, reference ``train_VIGOR.py:159-163``, and
the lukemelas EfficientNet-B0 weights, ``efficientnet_pytorch/utils.py:729-762``)
onto this framework's NHWC parameter pytrees.

Layout conversions:
* Conv2d weight  [O, I/g, kh, kw]  -> HWIO [kh, kw, I/g, O]
* ConvTranspose2d weight [I, O, 2, 2] -> [I, 2, 2, O]
* Linear weight [O, I] -> [I, O]; for the satellite descriptor Linear the
  input dim is a flatten of a [1280, 2, 2] chunk in torch's (C, H, W) order
  while this framework flattens NHWC chunks in (H, W, C) order, so the input
  axis is permuted accordingly (reference ``models.py:102-104,173-184``).

Works on any mapping of name -> array-like (torch tensors, numpy arrays).
Torch is only needed to *load* a .pt file, not to convert.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def load_state_dict(path):
    """Load a torch checkpoint file into a {name: np.ndarray} dict."""
    import torch  # local import: only needed for file IO

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


def _conv_w(v):
    return jnp.asarray(_np(v).transpose(2, 3, 1, 0))


def _deconv_w(v):
    return jnp.asarray(_np(v).transpose(0, 2, 3, 1))


def _vec(v):
    return jnp.asarray(_np(v))


def _bn(sd, prefix):
    params = {"scale": _vec(sd[prefix + ".weight"]),
              "bias": _vec(sd[prefix + ".bias"])}
    state = {"mean": _vec(sd[prefix + ".running_mean"]),
             "var": _vec(sd[prefix + ".running_var"])}
    return params, state


def import_b0(sd, prefix: str = "", num_blocks: int | None = None):
    """Convert an EfficientNet state_dict subtree (keys ``_conv_stem.*``,
    ``_blocks.N.*``, ``_conv_head.*``) to (params, state).  Works for any
    B0-B7 scaling (block count auto-detected)."""
    p = prefix
    if num_blocks is None:
        num_blocks = 1 + max(
            int(k[len(p) + 8:].split(".")[0]) for k in sd
            if k.startswith(p + "_blocks."))
    params = {"conv_stem": {"w": _conv_w(sd[p + "_conv_stem.weight"])}}
    state = {}
    params["bn0"], state["bn0"] = _bn(sd, p + "_bn0")
    params["blocks"], state["blocks"] = [], []
    for i in range(num_blocks):
        bp = f"{p}_blocks.{i}."
        bparams, bstate = {}, {}
        if bp + "_expand_conv.weight" in sd:
            bparams["expand_conv"] = {"w": _conv_w(sd[bp + "_expand_conv.weight"])}
            bparams["bn0"], bstate["bn0"] = _bn(sd, bp + "_bn0")
        bparams["depthwise_conv"] = {"w": _conv_w(sd[bp + "_depthwise_conv.weight"])}
        bparams["bn1"], bstate["bn1"] = _bn(sd, bp + "_bn1")
        bparams["se_reduce"] = {"w": _conv_w(sd[bp + "_se_reduce.weight"]),
                                "b": _vec(sd[bp + "_se_reduce.bias"])}
        bparams["se_expand"] = {"w": _conv_w(sd[bp + "_se_expand.weight"]),
                                "b": _vec(sd[bp + "_se_expand.bias"])}
        bparams["project_conv"] = {"w": _conv_w(sd[bp + "_project_conv.weight"])}
        bparams["bn2"], bstate["bn2"] = _bn(sd, bp + "_bn2")
        params["blocks"].append(bparams)
        state["blocks"].append(bstate)
    params["conv_head"] = {"w": _conv_w(sd[p + "_conv_head.weight"])}
    params["bn1"], state["bn1"] = _bn(sd, p + "_bn1")
    return params, state


def _conv(sd, prefix):
    out = {"w": _conv_w(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["b"] = _vec(sd[prefix + ".bias"])
    return out


def _deconv(sd, prefix):
    return {"w": _deconv_w(sd[prefix + ".weight"]),
            "b": _vec(sd[prefix + ".bias"])}


def _double_conv(sd, prefix):
    """double_conv / conv1-style Sequential: Conv at .0, Conv at .2
    (reference ``models.py:42-47,125-127``)."""
    return {"conv_a": _conv(sd, prefix + ".0"),
            "conv_b": _conv(sd, prefix + ".2")}


def _sat_linear(sd, prefix, chunk_hw: int = 2):
    """Linear(C*2*2 -> D) with input-axis reorder from torch (C,H,W)
    flatten order to NHWC (H,W,C) flatten order (C = 1280 for B0)."""
    w = _np(sd[prefix + ".weight"])  # [D, C*H*W] in (c, h, w) column order
    d = w.shape[0]
    chunk_c = w.shape[1] // (chunk_hw * chunk_hw)
    w = w.reshape(d, chunk_c, chunk_hw, chunk_hw)
    w = w.transpose(2, 3, 1, 0).reshape(chunk_c * chunk_hw * chunk_hw, d)
    return {"w": jnp.asarray(w), "b": _vec(sd[prefix + ".bias"])}


def _conv_w_back(w):
    return np.asarray(w).transpose(3, 2, 0, 1)


def _deconv_w_back(w):
    return np.asarray(w).transpose(0, 3, 1, 2)


def _bn_back(out, prefix, bn_params, bn_state):
    out[prefix + ".weight"] = np.asarray(bn_params["scale"])
    out[prefix + ".bias"] = np.asarray(bn_params["bias"])
    out[prefix + ".running_mean"] = np.asarray(bn_state["mean"])
    out[prefix + ".running_var"] = np.asarray(bn_state["var"])
    out[prefix + ".num_batches_tracked"] = np.zeros((), np.int64)


def export_b0(params, state, prefix: str = "",
              num_classes: int = 1000) -> dict:
    """Inverse of ``import_b0``: NHWC param tree -> torch-layout state_dict
    entries.  The classifier head ``_fc.*`` (never used by CCVPE) is emitted
    as zeros so ``load_state_dict(strict=True)`` finds every key."""
    p = prefix
    out = {p + "_conv_stem.weight": _conv_w_back(params["conv_stem"]["w"])}
    _bn_back(out, p + "_bn0", params["bn0"], state["bn0"])
    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        k = f"{p}_blocks.{i}."
        if "expand_conv" in bp:
            out[k + "_expand_conv.weight"] = _conv_w_back(
                bp["expand_conv"]["w"])
            _bn_back(out, k + "_bn0", bp["bn0"], bs["bn0"])
        out[k + "_depthwise_conv.weight"] = _conv_w_back(
            bp["depthwise_conv"]["w"])
        _bn_back(out, k + "_bn1", bp["bn1"], bs["bn1"])
        out[k + "_se_reduce.weight"] = _conv_w_back(bp["se_reduce"]["w"])
        out[k + "_se_reduce.bias"] = np.asarray(bp["se_reduce"]["b"])
        out[k + "_se_expand.weight"] = _conv_w_back(bp["se_expand"]["w"])
        out[k + "_se_expand.bias"] = np.asarray(bp["se_expand"]["b"])
        out[k + "_project_conv.weight"] = _conv_w_back(bp["project_conv"]["w"])
        _bn_back(out, k + "_bn2", bp["bn2"], bs["bn2"])
    out[p + "_conv_head.weight"] = _conv_w_back(params["conv_head"]["w"])
    _bn_back(out, p + "_bn1", params["bn1"], state["bn1"])
    feat = np.asarray(params["conv_head"]["w"]).shape[-1]
    out[p + "_fc.weight"] = np.zeros((num_classes, feat), np.float32)
    out[p + "_fc.bias"] = np.zeros((num_classes,), np.float32)
    return out


def _conv_back(out, prefix, p):
    out[prefix + ".weight"] = _conv_w_back(p["w"])
    if "b" in p:
        out[prefix + ".bias"] = np.asarray(p["b"])


def _sat_linear_back(p, chunk_hw: int = 2):
    w = np.asarray(p["w"])  # [(h,w,c) flat, D]
    d = w.shape[1]
    chunk_c = w.shape[0] // (chunk_hw * chunk_hw)
    w = w.reshape(chunk_hw, chunk_hw, chunk_c, d)
    w = w.transpose(3, 2, 0, 1).reshape(d, chunk_c * chunk_hw * chunk_hw)
    return w, np.asarray(p["b"])


def export_cvm(params, state) -> dict:
    """Inverse of ``import_cvm``: this framework's (params, bn_state) -> a
    reference-compatible torch state_dict mapping (name -> np.ndarray;
    loadable with ``model.load_state_dict(.., strict=True)`` after tensor
    conversion, or saved via ``save_torch_checkpoint``).  Enables training
    here and evaluating/visualizing with reference-ecosystem tooling."""
    out = {}
    out.update(export_b0(params["grd_efficientnet"],
                         state["grd_efficientnet"], "grd_efficientnet."))
    out.update(export_b0(params["sat_efficientnet"],
                         state["sat_efficientnet"], "sat_efficientnet."))
    for k in range(1, 7):
        name = f"grd_feature_to_descriptor{k}"
        _conv_back(out, f"{name}.0", params[name]["conv_c"])
        _conv_back(out, f"{name}.2", params[name]["conv_h"])
    w, b = _sat_linear_back(params["sat_feature_to_descriptors"])
    out["sat_feature_to_descriptors.1.weight"] = w
    out["sat_feature_to_descriptors.1.bias"] = b
    for k in range(1, 7):
        for suffix in ("", "_ori"):
            dp = params[f"deconv{k}{suffix}"]
            out[f"deconv{k}{suffix}.weight"] = _deconv_w_back(dp["w"])
            out[f"deconv{k}{suffix}.bias"] = np.asarray(dp["b"])
            cp = params[f"conv{k}{suffix}"]
            _conv_back(out, f"conv{k}{suffix}.0", cp["conv_a"])
            _conv_back(out, f"conv{k}{suffix}.2", cp["conv_b"])
    return out


def save_torch_checkpoint(path: str, params, state):
    """Write a reference-format ``model.pt`` (torch.save of the exported
    state_dict; mirrors the reference's ``train_VIGOR.py:159-163`` output)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_cvm(params, state).items()}
    torch.save(sd, path)


def import_cvm(sd):
    """Convert a full CCVPE model state_dict (any of the four reference
    variants — they share one parameter tree, reference ``models.py``) to
    (params, state).

    The returned tree matches ``ccvpe_tpu.models.cvm`` param naming.
    """
    params, state = {}, {}
    params["grd_efficientnet"], state["grd_efficientnet"] = import_b0(
        sd, "grd_efficientnet.")
    params["sat_efficientnet"], state["sat_efficientnet"] = import_b0(
        sd, "sat_efficientnet.")
    for k in range(1, 7):
        name = f"grd_feature_to_descriptor{k}"
        params[name] = {"conv_c": _conv(sd, f"{name}.0"),
                        "conv_h": _conv(sd, f"{name}.2")}
    params["sat_feature_to_descriptors"] = _sat_linear(
        sd, "sat_feature_to_descriptors.1")
    for k in range(1, 7):
        params[f"deconv{k}"] = _deconv(sd, f"deconv{k}")
        params[f"conv{k}"] = _double_conv(sd, f"conv{k}")
        params[f"deconv{k}_ori"] = _deconv(sd, f"deconv{k}_ori")
        params[f"conv{k}_ori"] = _double_conv(sd, f"conv{k}_ori")
    return params, state
