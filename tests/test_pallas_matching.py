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
