"""Stage-resume (load_stage) and language-mode coverage."""
import os

import numpy as np
import pytest

from dimo_tpu.io.synthetic import make_synthetic_videos
from dimo_tpu.train.loop import Trainer
from dimo_tpu.presets import tiny_synthetic_opt as tiny_opt
from dimo_tpu import test_modes
from dimo_tpu.models import gaussians as G


@pytest.fixture(scope="module")
def data():
    return make_synthetic_videos(num_motions=2, num_views=3, num_frames=5,
                                 ref_size=64, n_gauss=40, seed=0)


class TestStageResume:
    def test_resume_from_s1(self, data, tmp_path):
        """train s1 -> save -> fresh trainer with load_stage='s1' continues
        into s2 only (reference train_dynamic resume semantics)."""
        images, masks, meta = data
        opt = tiny_opt(save_path=str(tmp_path))
        tr = Trainer(opt, images, masks, meta)
        tr.prepare_train_s1()
        for _ in range(2):
            tr.train_step_once()
        tr.finish_s1()
        n_cpts = int(G.num_active(tr.state.aux))

        tr2 = Trainer(tiny_opt(save_path=str(tmp_path)), images, masks, meta)
        tr2.train_dynamic(iters_s1=5, iters_s2=2, load_stage="s1")
        assert tr2.stage == "s2"
        # s1 was skipped (no extra s1 steps): gaussians re-initialized via AG
        assert int(G.num_active(tr2.state.aux)) == n_cpts * 4
        assert os.path.exists(os.path.join(str(tmp_path), "s2",
                                           "point_cloud_c.ply"))


class TestLanguageMode:
    def test_language_with_precomputed_embedding(self, data, tmp_path_factory):
        """test_language with a precomputed BERT embedding + fallback
        projector (no BERT weights in this image)."""
        images, masks, meta = data
        save = str(tmp_path_factory.mktemp("ckpt"))
        vids = str(tmp_path_factory.mktemp("vids"))
        opt = tiny_opt(save_path=save, video_save_dir=vids)
        tr = Trainer(opt, images, masks, meta)
        tr.prepare_train_s1()
        tr.train_step_once()
        tr.finish_s1()
        tr.prepare_train_s2()
        tr.train_step_once()
        tr.finish_s2()

        emb = np.random.RandomState(0).randn(768).astype(np.float32)
        seq = test_modes.run_test_language(tr, "wave hands", text_emb=emb)
        assert len(seq) == 5
        assert any("wave hands" in f for f in os.listdir(vids))
        # the latent table was replaced by the single projected code
        lat = tr.state.params.latent
        code = lat.get("codes", lat.get("mu"))
        assert code.shape[0] == 1
