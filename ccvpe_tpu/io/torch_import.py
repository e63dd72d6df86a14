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


def _sat_linear(sd, prefix, chunk_c: int = 1280, chunk_hw: int = 2):
    """Linear(1280*2*2 -> D) with input-axis reorder from torch (C,H,W)
    flatten order to NHWC (H,W,C) flatten order."""
    w = _np(sd[prefix + ".weight"])  # [D, C*H*W] in (c, h, w) column order
    d = w.shape[0]
    w = w.reshape(d, chunk_c, chunk_hw, chunk_hw)
    w = w.transpose(2, 3, 1, 0).reshape(chunk_c * chunk_hw * chunk_hw, d)
    return {"w": jnp.asarray(w), "b": _vec(sd[prefix + ".bias"])}


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
