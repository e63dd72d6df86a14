"""Matching-op tests: einsum fast path == naive roll formulation == the
reference's torch loop semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from ccvpe_tpu.ops.matching import (
    matching_scores,
    matching_scores_reference,
    window_start,
)
from tests.conftest import assert_close


def _torch_loop(torch, x_nchw, g, shift, offsets, window):
    """Literal re-statement of the reference loop (models.py:191-201 /
    1092-1101) as a test oracle."""
    cs = x_nchw.shape[1]
    cg = g.shape[1]
    start = window_start(cs, cg, window)
    gmap = g[:, :, None, None].expand(-1, -1, x_nchw.shape[2], x_nchw.shape[3])
    gnorm = torch.norm(gmap, p="fro", dim=1, keepdim=True)
    outs = []
    for i in offsets:
        rolled = torch.roll(x_nchw, shifts=-int(i) * shift, dims=1)
        win = rolled[:, start:start + cg]
        wnorm = torch.norm(win, p="fro", dim=1, keepdim=True)
        outs.append(torch.sum(gmap * win, dim=1, keepdim=True) / (wnorm * gnorm))
    return torch.cat(outs, dim=1)


CASES = [
    # (cs, cg, shift, bins, window) — covers VIGOR scale1 (cg==cs), windowed,
    # KITTI-style degenerate periodicity, Oxford centered window, odd sizes
    (40, 40, 2, 20, "first"),
    (64, 40, 2, 20, "first"),
    (64, 32, 8, 16, "first"),     # shift*bins > cs: rolls wrap with period 8
    (64, 28, 4, 20, "center"),
    (30, 14, 3, 10, "center"),    # odd cs-cg
]


@pytest.mark.parametrize("cs,cg,shift,bins,window", CASES)
def test_fast_matches_naive(cs, cg, shift, bins, window):
    rng = np.random.default_rng(cs + cg)
    x = jnp.asarray(rng.standard_normal((2, 4, 5, cs), dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((2, cg), dtype=np.float32))
    offsets = tuple(range(bins))
    fast = matching_scores(x, g, shift, offsets, window)
    naive = matching_scores_reference(x, g, shift, offsets, window)
    assert_close(fast, naive, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cs,cg,shift,bins,window", CASES)
def test_fast_matches_torch_reference_loop(torch_oracle, cs, cg, shift, bins,
                                           window):
    torch = torch_oracle
    rng = np.random.default_rng(cs * 3 + cg)
    x = rng.standard_normal((2, 4, 5, cs), dtype=np.float32)
    g = rng.standard_normal((2, cg), dtype=np.float32)
    offsets = tuple(range(bins))
    ref = _torch_loop(torch, torch.tensor(x.transpose(0, 3, 1, 2)),
                      torch.tensor(g), shift, offsets, window).numpy()
    fast = matching_scores(jnp.asarray(x), jnp.asarray(g), shift, offsets,
                           window)
    assert_close(np.asarray(fast).transpose(0, 3, 1, 2), ref, atol=1e-5,
                 rtol=1e-5)


def test_negative_offsets_ori_prior():
    """Restricted bin range of the ori-prior model (models.py:489)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 3, 3, 64), dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((1, 40), dtype=np.float32))
    offsets = tuple(range(-3, 4))
    fast = matching_scores(x, g, 2, offsets, "first")
    naive = matching_scores_reference(x, g, 2, offsets, "first")
    assert fast.shape == (1, 3, 3, 7)
    assert_close(fast, naive, atol=1e-5, rtol=1e-5)
    # offset -i must equal offset bins-i of the full stack (roll periodicity)
    full = matching_scores(x, g, 2, tuple(range(32)), "first")
    assert_close(fast[..., 0], full[..., 29], atol=1e-6)
