"""Gradient parity: the full CVM_VIGOR backward pass vs torch autograd.

One batch, identical weights, identical loss (reference ``losses.py`` +
maxpool label pyramid), stochastic depth disabled; every parameter gradient
must match torch's (cosine similarity + relative-norm checks).  This is the
strongest training-faithfulness evidence available offline: if gradients
match, training trajectories match up to optimizer arithmetic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ccvpe_tpu.io.torch_import import import_b0, import_cvm
from ccvpe_tpu.models import cvm
from ccvpe_tpu.train import losses as L

# full-model torch-oracle backward sweeps (slow tier; run with --runslow)
pytestmark = pytest.mark.slow


def test_full_model_gradient_parity(torch_oracle):
    torch = torch_oracle
    import efficientnet_pytorch.model as enm
    import efficientnet_pytorch.utils as enu

    orig_fp = enm.EfficientNet.from_pretrained
    orig_dc = enm.drop_connect
    enm.EfficientNet.from_pretrained = classmethod(
        lambda cls, name, circular, **kw: cls.from_name(name, circular))
    enm.drop_connect = lambda x, p, training: x
    try:
        import models as rm
        import losses as rl

        # deterministic weights regardless of which tests consumed torch RNG
        # earlier in the session (the 1-1e-8 cosine bound is tight enough
        # that the margin varies with the draw)
        torch.manual_seed(17)
        tmodel = rm.CVM_VIGOR("cpu", circular_padding=True)
        tmodel.train()
        sd = {k: v.detach().numpy().copy()
              for k, v in tmodel.state_dict().items()}

        rng = np.random.default_rng(21)
        b = 1
        grd = rng.standard_normal((b, 3, 320, 640), dtype=np.float32)
        sat = rng.standard_normal((b, 3, 512, 512), dtype=np.float32)
        # GT via the reference formulas (dense): gaussian + 20 CCW bins
        from ccvpe_tpu.ops import gt as gt_ops

        row = jnp.asarray([7.0]); col = jnp.asarray([-12.0])
        ang = jnp.asarray([123.0])
        gt4, gwo, omap = gt_ops.synthesize_batch(row, col, ang, height=512,
                                                 width=512, bins=20)
        gt_np = np.asarray(gt4)      # [B,512,512,1]
        gwo_np = np.asarray(gwo)     # [B,512,512,20]
        omap_np = np.asarray(omap)   # [B,512,512,2]

        # ---- torch side (reference loss assembly, train_VIGOR.py:120-146)
        tg = torch.tensor(grd, requires_grad=False)
        ts = torch.tensor(sat, requires_grad=False)
        t_gt = torch.tensor(gt_np.transpose(0, 3, 1, 2))
        t_gwo = torch.tensor(gwo_np.transpose(0, 3, 1, 2))
        t_omap = torch.tensor(omap_np.transpose(0, 3, 1, 2))
        outs = tmodel(tg, ts)
        logits, heatmap, ori, *stacks = outs
        gt_flat = t_gt.flatten(1)
        gt_flat = gt_flat / gt_flat.sum(1, keepdim=True)
        loss = rl.cross_entropy_loss(logits, gt_flat)
        nce = []
        for k, stack in zip((64, 32, 16, 8, 4, 2), stacks):
            lab = torch.nn.MaxPool2d(k, stride=k)(t_gwo)
            nce.append(rl.infoNCELoss(stack.flatten(1), lab.flatten(1)))
        loss = loss + 1e4 * sum(nce) / 6 + 1e1 * rl.orientation_loss(
            ori, t_omap, t_gt)
        loss.backward()
        t_loss = float(loss)
        grad_sd = dict(sd)  # running stats stay (importer needs the keys)
        for name, p in tmodel.named_parameters():
            # unused params (the classifier _fc heads) have no grad
            grad_sd[name] = (p.grad.detach().numpy() if p.grad is not None
                             else np.zeros(p.shape, np.float32))
        t_grads, _ = import_cvm(grad_sd)

        # ---- jax side
        params, state = import_cvm(sd)

        def loss_fn(params):
            out, _ = cvm.forward(cvm.VIGOR, params, state,
                                 jnp.asarray(grd.transpose(0, 2, 3, 1)),
                                 jnp.asarray(sat.transpose(0, 2, 3, 1)),
                                 train=True, rng=None)
            total, _ = L.total_loss_binned(out, gt4, gwo, omap)
            return total

        j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(params)

        assert abs(float(j_loss) - t_loss) < 2e-3 * max(1.0, abs(t_loss)), (
            float(j_loss), t_loss)

        flat_t = jax.tree_util.tree_leaves_with_path(t_grads)
        flat_j = jax.tree_util.tree_leaves_with_path(j_grads)
        assert len(flat_t) == len(flat_j)

        # global agreement: all gradients concatenated
        all_t = np.concatenate(
            [np.asarray(g, np.float64).ravel() for _, g in flat_t])
        all_j = np.concatenate(
            [np.asarray(g, np.float64).ravel() for _, g in flat_j])
        gcos = float(all_t @ all_j
                     / (np.linalg.norm(all_t) * np.linalg.norm(all_j)))
        assert gcos > 1 - 1e-8, gcos
        assert (abs(np.linalg.norm(all_t) - np.linalg.norm(all_j))
                / np.linalg.norm(all_t)) < 1e-5

        # per-leaf agreement for non-degenerate leaves.  BN biases that feed
        # a downstream train-mode BatchNorm have (mathematically) ~zero
        # gradient — the mean subtraction cancels constants — so those leaves
        # are pure f32 cancellation noise (norms 5-7 orders below the median)
        # and are excluded by the norm threshold.
        med = np.median([np.linalg.norm(np.asarray(g)) for _, g in flat_t])
        bad = []
        for (kt, gt_leaf), (kj, gj_leaf) in zip(flat_t, flat_j):
            assert kt == kj
            a = np.asarray(gt_leaf, np.float64).ravel()
            c = np.asarray(gj_leaf, np.float64).ravel()
            na, nc = np.linalg.norm(a), np.linalg.norm(c)
            if max(na, nc) < 1e-4 * med:
                continue
            cos = float(a @ c / (na * nc + 1e-30))
            rel = abs(na - nc) / max(na, nc, 1e-30)
            if cos < 0.999 or rel > 2e-2:
                bad.append((jax.tree_util.keystr(kt), cos, rel, na, nc))
        assert not bad, bad[:10]
    finally:
        enm.EfficientNet.from_pretrained = orig_fp
        enm.drop_connect = orig_dc
