"""Pallas fused matching kernel vs the einsum path (interpreter mode on CPU;
the same kernel compiles natively on TPU — exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ccvpe_tpu.ops.matching import matching_scores
from ccvpe_tpu.ops.pallas_matching import matching_scores_pallas
from tests.conftest import assert_close

CASES = [
    (1280, 1280, 64, 20, "first"),   # VIGOR scale 1
    (640, 640, 32, 20, "first"),     # VIGOR scale 2
    (2048, 512, 128, 16, "first"),   # KITTI scale 1
    (1280, 224, 64, 20, "center"),   # Oxford scale 1
]


@pytest.mark.parametrize("cs,cg,shift,bins,window", CASES)
def test_pallas_matches_einsum(cs, cg, shift, bins, window):
    rng = np.random.default_rng(cs + cg)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, cs)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, cg)), jnp.float32)
    offsets = tuple(range(bins))
    want = matching_scores(x, g, shift, offsets, window)
    got = matching_scores_pallas(x, g, shift, offsets, window,
                                 interpret=True)
    assert_close(got, want, atol=1e-5, rtol=1e-5)


def test_pallas_gradients_match_einsum():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 64)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 40)), jnp.float32)
    offsets = tuple(range(8))

    def loss_pallas(x, g):
        return jnp.sum(
            matching_scores_pallas(x, g, 8, offsets, "first", True) ** 2)

    def loss_einsum(x, g):
        return jnp.sum(matching_scores(x, g, 8, offsets, "first") ** 2)

    gx_p, gg_p = jax.grad(loss_pallas, argnums=(0, 1))(x, g)
    gx_e, gg_e = jax.grad(loss_einsum, argnums=(0, 1))(x, g)
    assert_close(gx_p, gx_e, atol=1e-4, rtol=1e-4)
    assert_close(gg_p, gg_e, atol=1e-4, rtol=1e-4)


def test_pallas_odd_spatial_tile():
    """HW not divisible by the large tiles falls back to smaller tiles."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 64)), jnp.float32)  # HW=8
    g = jnp.asarray(rng.standard_normal((1, 64)), jnp.float32)
    offsets = tuple(range(4))
    want = matching_scores(x, g, 16, offsets)
    got = matching_scores_pallas(x, g, 16, offsets, "first", True)
    assert_close(got, want, atol=1e-5, rtol=1e-5)


def test_pallas_pads_undividable_spatial():
    """A spatial extent with no in-budget aligned divisor (41x41 at 1280
    channels exceeds the VMEM row budget) must take the pad-and-slice path,
    not a VMEM-busting ``tile=hw`` launch."""
    from ccvpe_tpu.ops.pallas_matching import _pick_tile

    cs = 1280
    hw = 41 * 41
    tile, hw_pad = _pick_tile(hw, cs)
    assert tile < hw and hw_pad % tile == 0 and hw_pad >= hw
    # within the picker's row budget (tile=hw would be 1681 > 1638)
    assert tile <= (1 << 21) // cs

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 41, 41, cs)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, cs)), jnp.float32)
    offsets = tuple(range(20))
    want = matching_scores(x, g, 64, offsets)
    got = matching_scores_pallas(x, g, 64, offsets, "first", True)
    assert not np.isnan(np.asarray(got)).any()
    assert_close(got, want, atol=1e-5, rtol=1e-5)

    # fused epilogue takes the same pad path
    from ccvpe_tpu.nn.layers import l2_normalize
    from ccvpe_tpu.ops.pallas_matching import matching_epilogue_pallas

    s, smax, xnorm = matching_epilogue_pallas(x, g, 64, offsets, "first",
                                              True)
    assert_close(s, want, atol=1e-5, rtol=1e-5)
    assert_close(smax, jnp.max(want, axis=-1, keepdims=True),
                 atol=1e-5, rtol=1e-5)
    assert_close(xnorm, l2_normalize(x, axis=-1), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cs,shift,bins,window", [
    (1280, 64, 20, "first"),    # VIGOR scale 1
    (256, 16, 16, "first"),     # KITTI-like bin count, small channels
    # (the fused kernel requires Cg == Cs, where 'center' == 'first')
])
def test_fused_epilogue_matches_composite(cs, shift, bins, window):
    from ccvpe_tpu.nn.layers import l2_normalize
    from ccvpe_tpu.ops.pallas_matching import matching_epilogue_pallas

    rng = np.random.default_rng(cs)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, cs)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, cs)), jnp.float32)
    offsets = tuple(range(bins))
    s, smax, xnorm = matching_epilogue_pallas(x, g, shift, offsets, window,
                                              True)
    want = matching_scores(x, g, shift, offsets, window)
    assert_close(s, want, atol=1e-5, rtol=1e-5)
    assert_close(smax, jnp.max(want, axis=-1, keepdims=True),
                 atol=1e-5, rtol=1e-5)
    assert_close(xnorm, l2_normalize(x, axis=-1), atol=1e-5, rtol=1e-5)


def test_fused_epilogue_gradients():
    from ccvpe_tpu.ops.pallas_matching import matching_epilogue_pallas
    from ccvpe_tpu.nn.layers import l2_normalize

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 128)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    offsets = tuple(range(8))

    def loss_fused(x, g):
        s, smax, xnorm = matching_epilogue_pallas(x, g, 16, offsets,
                                                  "first", True)
        return jnp.sum(s ** 2) + jnp.sum(smax) + jnp.sum(xnorm ** 3)

    def loss_composite(x, g):
        s = matching_scores(x, g, 16, offsets, "first")
        return (jnp.sum(s ** 2) + jnp.sum(jnp.max(s, axis=-1))
                + jnp.sum(l2_normalize(x, axis=-1) ** 3))

    gx_p, gg_p = jax.grad(loss_fused, argnums=(0, 1))(x, g)
    gx_e, gg_e = jax.grad(loss_composite, argnums=(0, 1))(x, g)
    assert_close(gx_p, gx_e, atol=1e-4, rtol=1e-4)
    assert_close(gg_p, gg_e, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_model_forward_pallas_matches_einsum():
    """Full NANO forward with matching_impl='pallas' (fused epilogue where
    dispatched, interpreter on CPU) equals the einsum forward."""
    from ccvpe_tpu.models import cvm

    cfg = cvm.NANO
    params, state = cvm.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    grd = jnp.asarray(rng.standard_normal((1, *cfg.grd_hw, 3)), jnp.float32)
    sat = jnp.asarray(rng.standard_normal((1, *cfg.sat_hw, 3)), jnp.float32)
    out_e, _ = cvm.forward(cfg, params, state, grd, sat, train=False)
    out_p, _ = cvm.forward(cfg, params, state, grd, sat, train=False,
                           matching_impl="pallas")
    assert_close(out_p.heatmap, out_e.heatmap, atol=1e-6, rtol=1e-5)
    assert_close(out_p.ori, out_e.ori, atol=1e-5, rtol=1e-5)
    for a, b in zip(out_p.matching_scores, out_e.matching_scores):
        assert_close(a, b, atol=1e-5, rtol=1e-5)


def test_pick_tile_fallback_prefers_mxu_filling_tiles():
    """The pad fallback must not minimize padding with tiny tiles: hw=4356
    at cs=320 should tile at >=256 rows (handfuls of grid steps), not 8
    rows (545 steps of near-empty matmuls), while keeping padding small."""
    from ccvpe_tpu.ops.pallas_matching import _pick_tile

    tile, hw_pad = _pick_tile(66 * 66, 320)
    assert tile >= 256, tile
    assert hw_pad % tile == 0 and hw_pad >= 66 * 66
    assert (hw_pad - 66 * 66) / (66 * 66) < 0.10  # <10% padded work
    # divisible shipped shapes are untouched by the fallback policy
    assert _pick_tile(4096, 320) == (4096, 4096)
    assert _pick_tile(1024, 1280) == (1024, 1024)
