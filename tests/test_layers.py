"""Unit tests for core ops: SAME/circular conv, BN, deconv, pooling —
verified against torch semantics (the reference's numerical behavior)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ccvpe_tpu.nn import layers as L
from tests.conftest import assert_close


def _nchw(x_nhwc):
    return np.asarray(x_nhwc).transpose(0, 3, 1, 2)


def _nhwc(x_nchw):
    return np.asarray(x_nchw).transpose(0, 2, 3, 1)


class TestSamePad:
    def test_static_same_pad_matches_torch_formula(self):
        # k3 s1: always (1,1),(1,1)
        assert L.same_pad((224, 224), 3, 1) == ((1, 1), (1, 1))
        # k3 s2 @224: pad 1 -> (0,1)
        assert L.same_pad((224, 224), 3, 2) == ((0, 1), (0, 1))
        # k5 s2 @28: pad 3 -> (1,2)
        assert L.same_pad((28, 28), 5, 2) == ((1, 2), (1, 2))
        # k5 s1: (2,2)
        assert L.same_pad((14, 14), 5, 1) == ((2, 2), (2, 2))

    def test_conv_same_vs_torch(self, torch_oracle):
        torch = torch_oracle
        import sys
        sys.path.insert(0, "/root/reference")
        from efficientnet_pytorch.utils import Conv2dStaticSamePadding

        rng = np.random.default_rng(0)
        for k, s, hw in [(3, 1, (17, 23)), (3, 2, (16, 32)), (5, 2, (11, 13))]:
            tconv = Conv2dStaticSamePadding(6, 8, k, stride=s, image_size=224,
                                            bias=False)
            x = rng.standard_normal((2, 6, *hw), dtype=np.float32)
            ref = tconv(torch.tensor(x)).detach().numpy()

            spec = L.ConvSpec(6, 8, k, s, pad=L.same_pad((224, 224), k, s))
            params = {"w": jnp.asarray(
                tconv.weight.detach().numpy().transpose(2, 3, 1, 0))}
            out = L.conv_apply(params, jnp.asarray(_nhwc(x)), spec)
            assert_close(_nchw(out), ref, atol=1e-5)

    def test_conv_circular_vs_torch(self, torch_oracle):
        torch = torch_oracle
        from efficientnet_pytorch.utils import Conv2dStaticCircularPadding

        rng = np.random.default_rng(1)
        for k, s, hw in [(3, 1, (10, 20)), (3, 2, (12, 18)), (5, 2, (14, 28))]:
            tconv = Conv2dStaticCircularPadding(4, 5, k, stride=s,
                                                image_size=224, bias=False)
            x = rng.standard_normal((2, 4, *hw), dtype=np.float32)
            ref = tconv(torch.tensor(x)).detach().numpy()

            spec = L.ConvSpec(4, 5, k, s, pad=L.same_pad((224, 224), k, s),
                              circular=True)
            params = {"w": jnp.asarray(
                tconv.weight.detach().numpy().transpose(2, 3, 1, 0))}
            out = L.conv_apply(params, jnp.asarray(_nhwc(x)), spec)
            assert_close(_nchw(out), ref, atol=1e-5)


class TestBatchNorm:
    def test_eval_vs_torch(self, torch_oracle):
        torch = torch_oracle
        bn = torch.nn.BatchNorm2d(7, momentum=0.01, eps=1e-3)
        bn.weight.data.uniform_(0.5, 1.5)
        bn.bias.data.uniform_(-0.5, 0.5)
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2.0)
        bn.eval()
        x = np.random.default_rng(2).standard_normal((3, 7, 5, 6),
                                                     dtype=np.float32)
        ref = bn(torch.tensor(x)).detach().numpy()

        params = {"scale": jnp.asarray(bn.weight.detach().numpy()),
                  "bias": jnp.asarray(bn.bias.detach().numpy())}
        state = {"mean": jnp.asarray(bn.running_mean.numpy()),
                 "var": jnp.asarray(bn.running_var.numpy())}
        y, new_state = L.bn_apply(params, state, jnp.asarray(_nhwc(x)),
                                  train=False)
        assert_close(_nchw(y), ref, atol=1e-5)
        assert new_state is state

    def test_train_vs_torch(self, torch_oracle):
        torch = torch_oracle
        bn = torch.nn.BatchNorm2d(4, momentum=0.01, eps=1e-3)
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2.0)
        # .copy(): torch updates running stats in-place and jnp.asarray may
        # alias the numpy buffer on CPU
        state = {"mean": jnp.asarray(bn.running_mean.numpy().copy()),
                 "var": jnp.asarray(bn.running_var.numpy().copy())}
        bn.train()
        x = np.random.default_rng(3).standard_normal((4, 4, 6, 5),
                                                     dtype=np.float32)
        ref = bn(torch.tensor(x)).detach().numpy()

        params = {"scale": jnp.asarray(bn.weight.detach().numpy()),
                  "bias": jnp.asarray(bn.bias.detach().numpy())}
        y, new_state = L.bn_apply(params, state, jnp.asarray(_nhwc(x)),
                                  train=True)
        assert_close(_nchw(y), ref, atol=1e-5)
        assert_close(new_state["mean"], bn.running_mean.numpy(), atol=1e-6)
        assert_close(new_state["var"], bn.running_var.numpy(), atol=1e-5)


class TestDeconv:
    def test_deconv2x2_vs_torch(self, torch_oracle):
        torch = torch_oracle
        deconv = torch.nn.ConvTranspose2d(9, 5, 2, 2)
        x = np.random.default_rng(4).standard_normal((2, 9, 4, 6),
                                                     dtype=np.float32)
        ref = deconv(torch.tensor(x)).detach().numpy()

        params = {
            "w": jnp.asarray(
                deconv.weight.detach().numpy().transpose(0, 2, 3, 1)),
            "b": jnp.asarray(deconv.bias.detach().numpy()),
        }
        y = L.deconv2x2_apply(params, jnp.asarray(_nhwc(x)))
        assert_close(_nchw(y), ref, atol=1e-5)


class TestPooling:
    def test_max_pool_matches_torch(self, torch_oracle):
        torch = torch_oracle
        x = np.random.default_rng(5).standard_normal((2, 3, 16, 16),
                                                     dtype=np.float32)
        for w in (2, 4, 8):
            ref = torch.nn.MaxPool2d(w, stride=w)(torch.tensor(x)).numpy()
            y = L.max_pool(jnp.asarray(_nhwc(x)), w)
            assert_close(_nchw(y), ref, atol=0)

    def test_l2_normalize_matches_torch(self, torch_oracle):
        torch = torch_oracle
        x = np.random.default_rng(6).standard_normal((2, 6, 3, 3),
                                                     dtype=np.float32)
        x[0, :, 0, 0] = 0.0  # exercise the eps guard
        ref = torch.nn.functional.normalize(torch.tensor(x), p=2, dim=1).numpy()
        y = L.l2_normalize(jnp.asarray(_nhwc(x)), axis=-1)
        assert_close(_nchw(y), ref, atol=1e-6)


class TestDropConnect:
    def test_keeps_expectation(self):
        x = jnp.ones((512, 2, 2, 3))
        y = L.drop_connect(x, 0.25, jax.random.PRNGKey(0))
        # surviving samples are scaled by 1/keep; mean stays ~1
        vals = np.unique(np.asarray(y))
        assert set(np.round(vals, 5)) <= {0.0, np.float32(np.round(1 / 0.75, 5))}
        assert abs(float(y.mean()) - 1.0) < 0.1


class TestMaxPoolSame:
    def test_max_pool_same_vs_torch(self, torch_oracle):
        torch = torch_oracle
        from efficientnet_pytorch.utils import (
            MaxPool2dStaticSamePadding,
            MaxPool2dStaticCircularPadding,
        )

        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, 3, 15, 22), dtype=np.float32)
        for k, s in [(3, 2), (2, 2), (3, 1)]:
            ref = MaxPool2dStaticSamePadding(k, s, image_size=224)(
                torch.tensor(x)).numpy()
            got = L.max_pool_same(jnp.asarray(_nhwc(x)), k, s,
                                  L.same_pad((224, 224), k, s))
            assert_close(_nchw(got), ref, atol=0)
        ref = MaxPool2dStaticCircularPadding(3, 2, image_size=224)(
            torch.tensor(x)).numpy()
        got = L.max_pool_same(jnp.asarray(_nhwc(x)), 3, 2,
                              L.same_pad((224, 224), 3, 2), circular=True)
        assert_close(_nchw(got), ref, atol=0)
