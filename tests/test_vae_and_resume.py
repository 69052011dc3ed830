"""VAE latent path + full-state resume + latent finetune smoke tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from dimo_tpu.io.synthetic import make_synthetic_videos
from dimo_tpu.train.loop import Trainer
from dimo_tpu.presets import tiny_synthetic_opt as tiny_opt
from dimo_tpu.models import gaussians as G


@pytest.fixture(scope="module")
def data():
    return make_synthetic_videos(num_motions=2, num_views=3, num_frames=5,
                                 ref_size=64, n_gauss=40, seed=0)


class TestVAE:
    def test_vae_training_runs(self, data):
        images, masks, meta = data
        tr = Trainer(tiny_opt(vae_latent=True), images, masks, meta)
        tr.prepare_train_s1()
        vals = []
        tr.log_fn = lambda s, st, m, **k: vals.append(
            {k2: float(v) for k2, v in m.items() if np.ndim(v) == 0})
        for _ in range(3):
            tr.train_step_once()
        assert all(np.isfinite(v["loss"]) for v in vals)
        # KL term is being computed
        assert any(v["kl"] != 0.0 for v in vals)
        assert "mu" in tr.state.params.latent

    def test_vae_checkpoint_roundtrip(self, data, tmp_path):
        images, masks, meta = data
        tr = Trainer(tiny_opt(vae_latent=True, save_path=str(tmp_path)),
                     images, masks, meta)
        tr.prepare_train_s1()
        tr.train_step_once()
        tr.save_checkpoint("s1")
        mu_before = np.asarray(tr.state.params.latent["mu"])
        tr.load_checkpoint("s1")
        np.testing.assert_allclose(
            np.asarray(tr.state.params.latent["mu"]), mu_before, atol=1e-6)


class TestFullStateResume:
    def test_roundtrip_including_moments(self, data, tmp_path):
        images, masks, meta = data
        tr = Trainer(tiny_opt(), images, masks, meta)
        tr.prepare_train_s1()
        for _ in range(2):
            tr.train_step_once()
        path = str(tmp_path / "full_state.npz")
        tr.save_full_state(path)
        xyz_before = np.asarray(tr.state.params.xyz)
        mu_before = np.asarray(tr.state.opt.mu.xyz)
        step_before = int(tr.state.step)
        # perturb then restore
        tr.train_step_once()
        tr.load_full_state(path)
        np.testing.assert_allclose(np.asarray(tr.state.params.xyz),
                                   xyz_before, atol=1e-7)
        np.testing.assert_allclose(np.asarray(tr.state.opt.mu.xyz),
                                   mu_before, atol=1e-7)
        assert int(tr.state.step) == step_before


class TestLatentFinetune:
    def test_finetune_latent_moves_only_latent(self, data):
        from dimo_tpu import test_modes
        images, masks, meta = data
        tr = Trainer(tiny_opt(), images, masks, meta)
        tr.prepare_train_s1()
        tr.train_step_once()
        tr.finish_s1()
        tr.prepare_train_s2()
        tr.train_step_once()

        xyz_before = np.asarray(tr.state.params.xyz)
        tn_before = np.asarray(tr.state.params.timenet["trunk_0_w"])
        metrics = test_modes.finetune_latent_to_motion(
            tr, images[1], masks[1], iters=2)
        assert np.isfinite(float(metrics["loss"]))
        # only the latent should have trained
        np.testing.assert_allclose(np.asarray(tr.state.params.xyz),
                                   xyz_before, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(tr.state.params.timenet["trunk_0_w"]), tn_before,
            atol=1e-7)
        assert tr.state.params.latent["codes"].shape[0] == 1


class TestInteractiveHtml:
    def test_html_generated(self):
        from dimo_tpu import viz
        tracks = np.random.RandomState(0).randn(5, 12, 3).astype(np.float32)
        html = viz.interactive_3d_html(tracks)
        assert html.startswith("<!DOCTYPE html>")
        assert "canvas" in html and "orbit" in html
