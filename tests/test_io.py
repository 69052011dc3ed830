"""PLY codec, checkpoint and config tests (round-trips + torch interop)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dimo_tpu.io import ply, config as cfg_io, checkpoint as ckpt


class TestPly:
    def test_gaussian_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        n, deg = 17, 0
        path = str(tmp_path / "pc.ply")
        xyz = rng.randn(n, 3).astype(np.float32)
        fdc = rng.randn(n, 1, 3).astype(np.float32)
        frest = np.zeros((n, 0, 3), np.float32)
        op = rng.randn(n, 1).astype(np.float32)
        sc = rng.randn(n, 3).astype(np.float32)
        rot = rng.randn(n, 4).astype(np.float32)
        ply.save_gaussians(path, xyz, fdc, frest, op, sc, rot)
        out = ply.load_gaussians(path, deg)
        np.testing.assert_allclose(out["xyz"], xyz, atol=1e-6)
        np.testing.assert_allclose(out["features_dc"], fdc, atol=1e-6)
        np.testing.assert_allclose(out["opacity"], op, atol=1e-6)
        np.testing.assert_allclose(out["scaling"], sc, atol=1e-6)
        np.testing.assert_allclose(out["rotation"], rot, atol=1e-6)

    def test_sh3_roundtrip(self, tmp_path):
        rng = np.random.RandomState(1)
        n, deg = 5, 3
        k = (deg + 1) ** 2
        path = str(tmp_path / "pc3.ply")
        fdc = rng.randn(n, 1, 3).astype(np.float32)
        frest = rng.randn(n, k - 1, 3).astype(np.float32)
        ply.save_gaussians(path, rng.randn(n, 3), fdc, frest,
                           rng.randn(n, 1), rng.randn(n, 3), rng.randn(n, 4))
        out = ply.load_gaussians(path, deg)
        np.testing.assert_allclose(out["features_rest"], frest, atol=1e-6)

    def test_control_points_roundtrip(self, tmp_path):
        rng = np.random.RandomState(2)
        path = str(tmp_path / "c.ply")
        c = rng.randn(9, 3).astype(np.float32)
        r = rng.randn(9, 1).astype(np.float32)
        ply.save_control_points(path, c, r)
        out = ply.load_control_points(path)
        np.testing.assert_allclose(out["c_xyz"], c, atol=1e-6)
        np.testing.assert_allclose(out["c_radius"], r, atol=1e-6)


class TestConfig:
    def test_yaml_and_dotlist(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("a: 1\nlr: 0.01\nname: foo\nflag: true\n")
        cfg = cfg_io.load_config(str(p), ["a=5", "name=bar", "new_key=2.5",
                                          "flag=false"])
        assert cfg.a == 5 and cfg.name == "bar"
        assert cfg.new_key == 2.5 and cfg.flag is False
        assert cfg.lr == 0.01
        assert cfg.get("missing", 7) == 7

    def test_reference_train_config_loads(self):
        path = os.path.join(os.path.dirname(__file__), "..",
                            "configs", "train_config.yaml")
        cfg = cfg_io.load_config(path)
        assert cfg.num_cpts == 512
        assert cfg.lambda_mse == 5000.0
        assert cfg.init_type == "ag"


class TestCheckpoint:
    def test_npz_roundtrip(self, tmp_path):
        import jax
        from dimo_tpu.models import timenet as T
        params = T.init_timenet(jax.random.PRNGKey(0), latent_dim=8)
        latent = {"codes": jnp.asarray(np.random.RandomState(0).randn(3, 8),
                                       jnp.float32)}
        ckpt.save_model(str(tmp_path), latent, params, torch_compat=False)
        lat2, tn2 = ckpt.load_model(str(tmp_path))
        np.testing.assert_allclose(lat2["codes"], latent["codes"], atol=1e-6)
        for k in params:
            np.testing.assert_allclose(tn2[k], params[k], atol=1e-6)

    def test_torch_pth_interop(self, tmp_path):
        torch = pytest.importorskip("torch")
        import jax
        from dimo_tpu.models import timenet as T
        params = T.init_timenet(jax.random.PRNGKey(1), latent_dim=8)
        sd = ckpt.timenet_to_torch_state(params)
        # reference layer shapes
        assert sd["deformnet.0.weight"].shape == (256, T.input_dim(8))
        assert sd["pts_layers.2.weight"].shape == (3, 256)
        assert sd["rot_layers.2.bias"].tolist() == [1.0, 0.0, 0.0, 0.0]
        back = ckpt.timenet_from_torch_state(
            {k: v.numpy() for k, v in sd.items()})
        for k in params:
            np.testing.assert_allclose(back[k], params[k], atol=1e-6)
