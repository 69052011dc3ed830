"""Test-mode driver tests on a tiny trained model (CPU interpret mode)."""
import os

import numpy as np
import pytest

from dimo_tpu.io.synthetic import make_synthetic_videos
from dimo_tpu.train.loop import Trainer
from dimo_tpu.presets import tiny_synthetic_opt as tiny_opt
from dimo_tpu import test_modes


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    images, masks, meta = make_synthetic_videos(
        num_motions=2, num_views=3, num_frames=5, ref_size=64, n_gauss=40,
        seed=0)
    save = str(tmp_path_factory.mktemp("ckpt"))
    vids = str(tmp_path_factory.mktemp("videos"))
    opt = tiny_opt(save_path=save, video_save_dir=vids)
    tr = Trainer(opt, images, masks, meta)
    tr.prepare_train_s1()
    for _ in range(3):
        tr.train_step_once()
    tr.finish_s1()
    tr.prepare_train_s2()
    for _ in range(2):
        tr.train_step_once()
    tr.finish_s2()
    return tr


class TestRenderSequence:
    def test_fixed_sequence(self, trained):
        frames = test_modes.render_sequence(trained, 0, "s2", "fixed")
        assert len(frames) == 5
        assert frames[0].shape == (128, 128, 3)
        assert frames[0].dtype == np.uint8
        # renders contain content (not all background)
        assert frames[0].std() > 1.0

    def test_orbit_sequence_differs(self, trained):
        fixed = test_modes.render_sequence(trained, 0, "s2", "fixed")
        orbit = test_modes.render_sequence(trained, 0, "s2", "circle")
        diff = np.abs(fixed[2].astype(int) - orbit[2].astype(int)).mean()
        assert diff > 0.5


class TestCpts:
    def test_cpts_outputs(self, trained):
        frames, traj_imgs, traj3d, traj_pts = test_modes.test_cpts(
            trained, test_stage="s2", latent_index=0,
            motion_video_name="m0", make_3d=False)
        assert len(frames) == 5
        n_active = int(np.asarray(trained.state.aux.c_active).sum())
        assert traj_pts.shape == (n_active, 5, 2)
        assert len(traj_imgs) == 5


class TestDefaultTest:
    def test_videos_written(self, trained):
        test_modes.run_default_test(trained, render_type="fixed",
                                    do_cpts=False)
        vids = os.listdir(trained.opt.video_save_dir)
        assert any("motion_00" in v for v in vids)
        assert any("motion_01" in v for v in vids)


class TestInterpolation:
    def test_interpolation_runs(self, trained):
        seq = test_modes.run_test_interpolation(trained)
        assert len(seq) == 5
        # all latents were replaced by the shared mix
        codes = np.asarray(trained.state.params.latent["codes"])
        np.testing.assert_allclose(codes[0], codes[1], atol=1e-6)


class TestFps:
    def test_fps_positive(self, trained):
        fps = test_modes.run_test_fps(trained, rounds=3, size=128)
        assert fps > 0

    def test_fps_spatial_parallel(self, trained):
        """spatial_parallel=4 engages the sp mesh inside the product fps
        harness (128^2 -> 4 strip buffers, one per device)."""
        trained.opt["spatial_parallel"] = 4
        try:
            fps = test_modes.run_test_fps(trained, rounds=3, size=128)
        finally:
            del trained.opt["spatial_parallel"]
        assert fps > 0


class TestUnaligned:
    def test_cpt_only_phase_then_full(self, trained):
        images, masks, _ = make_synthetic_videos(
            num_motions=1, num_views=3, num_frames=5, ref_size=64,
            n_gauss=40, seed=7)
        m = test_modes.run_test_unaligned_motion(
            trained, images[0], masks[0], iters_a=2, iters_b=2)
        assert np.isfinite(float(m["loss"]))
        assert trained.state.params.latent["codes"].shape[0] == 1
