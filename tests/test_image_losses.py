"""Tests for image losses; SSIM cross-checked against a torch replica of the
reference implementation (`src/loss.py:132-175`)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dimo_tpu.ops import image_losses as L


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        assert float(L.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_different_images_below_one(self):
        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
        b = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
        assert float(L.ssim(a, b)) < 0.5

    def test_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        def torch_ssim(i1, i2, ws=11):
            # replica of reference src/loss.py ssim
            import math
            g = torch.tensor([math.exp(-(x - ws // 2) ** 2 / (2 * 1.5 ** 2))
                              for x in range(ws)])
            g = (g / g.sum()).unsqueeze(1)
            w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
            ch = i1.size(-3)
            win = w2.expand(ch, 1, ws, ws).contiguous()
            mu1 = F.conv2d(i1, win, padding=ws // 2, groups=ch)
            mu2 = F.conv2d(i2, win, padding=ws // 2, groups=ch)
            mu1s, mu2s, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
            s1 = F.conv2d(i1 * i1, win, padding=ws // 2, groups=ch) - mu1s
            s2 = F.conv2d(i2 * i2, win, padding=ws // 2, groups=ch) - mu2s
            s12 = F.conv2d(i1 * i2, win, padding=ws // 2, groups=ch) - mu12
            c1, c2 = 0.01 ** 2, 0.03 ** 2
            m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
            return m.mean().item()

        rng = np.random.RandomState(2)
        a = rng.rand(2, 3, 24, 24).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(*a.shape).astype(np.float32), 0, 1)
        ours = float(L.ssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                            jnp.asarray(b.transpose(0, 2, 3, 1))))
        theirs = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
        assert ours == pytest.approx(theirs, abs=2e-4)


class TestSmoothness:
    def test_edge_aware_zero_for_constant_depth(self):
        d = jnp.ones((1, 16, 16, 1))
        rgb = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3), jnp.float32)
        assert float(L.edge_aware_smoothness(d, rgb)) == pytest.approx(0.0, abs=1e-7)

    def test_bilateral_floor_is_two(self):
        # constant normal -> each term sqrt(1+0)=1, sum=2
        n = jnp.ones((1, 16, 16, 3)) * 0.5
        rgb = jnp.zeros((1, 16, 16, 3))
        assert float(L.bilateral_normal_smoothness(n, rgb)) == pytest.approx(2.0, abs=1e-6)


class TestMisc:
    def test_psnr(self):
        assert float(L.psnr(jnp.asarray(0.01))) == pytest.approx(20.0, abs=1e-4)

    def test_pearson_perfect_corr(self):
        d = jnp.asarray(np.random.RandomState(1).rand(16, 16), jnp.float32)
        assert float(L.pearson_depth_loss(d, d * 3 + 1)) == pytest.approx(0.0, abs=1e-4)

    def test_tv_norm_shapes(self):
        v = jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 1), jnp.float32)
        assert L.tv_norm(v).shape == (2, 7, 7, 1)
