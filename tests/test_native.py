"""Native C++ runtime library tests (PLY codec + async batch packer).

Skipped when native/libdimo_native.so hasn't been built
(scripts/build_native.sh).
"""
import numpy as np
import pytest

from dimo_tpu.io import native, ply

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


class TestNativePly:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        cols = rng.randn(100, 5).astype(np.float32)
        names = ["x", "y", "z", "opacity", "scale_0"]
        path = str(tmp_path / "n.ply")
        assert native.ply_write(path, names, cols)
        out = native.ply_read(path)
        assert list(out.keys()) == names
        for i, n in enumerate(names):
            np.testing.assert_allclose(out[n], cols[:, i], atol=1e-7)

    def test_python_reads_native_file(self, tmp_path):
        """Byte-compat: the python codec parses files the C++ wrote."""
        rng = np.random.RandomState(1)
        n = 17
        path = str(tmp_path / "pc.ply")
        xyz = rng.randn(n, 3).astype(np.float32)
        fdc = rng.randn(n, 1, 3).astype(np.float32)
        op = rng.randn(n, 1).astype(np.float32)
        sc = rng.randn(n, 3).astype(np.float32)
        rot = rng.randn(n, 4).astype(np.float32)
        ply.save_gaussians(path, xyz, fdc, np.zeros((n, 0, 3), np.float32),
                           op, sc, rot)
        # force python reader on the same file
        out_native = ply._read_ply(path)
        # and python reference parse
        from dimo_tpu.io import native as nat
        saved = nat._LIB
        nat._LIB = None
        try:
            out_py = ply._read_ply(path)
        finally:
            nat._LIB = saved
        for k in out_py:
            np.testing.assert_allclose(out_native[k], out_py[k], atol=1e-7)


class TestBatchPacker:
    def test_gathers_correct_frames(self):
        rng = np.random.RandomState(2)
        images = rng.randint(0, 255, (20, 8, 8, 3), dtype=np.uint8)
        masks = rng.randint(0, 255, (20, 8, 8), dtype=np.uint8)
        p = native.BatchPacker(images, masks, batch=4)
        idx = np.array([3, 17, 0, 9], np.int64)
        p.submit(idx)
        img, msk = p.get()
        np.testing.assert_array_equal(img, images[idx])
        np.testing.assert_array_equal(msk, masks[idx])
        # second round (reuse)
        idx2 = np.array([1, 2, 3, 4], np.int64)
        p.submit(idx2)
        img, msk = p.get()
        np.testing.assert_array_equal(img, images[idx2])
        p.close()

    def test_double_buffered_prefetch(self):
        """submit(k+1) before get(k)'s buffers are consumed: slots must not
        alias (the Trainer's pipelined usage)."""
        rng = np.random.RandomState(3)
        images = rng.randint(0, 255, (30, 4, 4, 3), dtype=np.uint8)
        masks = rng.randint(0, 255, (30, 4, 4), dtype=np.uint8)
        p = native.BatchPacker(images, masks, batch=3, slots=2)
        a = np.array([5, 6, 7], np.int64)
        b = np.array([20, 1, 2], np.int64)
        c = np.array([9, 9, 0], np.int64)
        p.submit(a)
        img_a, msk_a = p.get()
        p.submit(b)                      # packs into the OTHER slot
        np.testing.assert_array_equal(img_a, images[a])  # slot a intact
        img_b, _ = p.get()
        p.submit(c)
        np.testing.assert_array_equal(img_b, images[b])
        img_c, msk_c = p.get()
        np.testing.assert_array_equal(img_c, images[c])
        np.testing.assert_array_equal(msk_c, masks[c])
        p.close()

    def test_trainer_uses_packer(self, monkeypatch):
        """With the device-resident dataset cache off (the >2GB / forced
        fallback regime), the product sample_batch routes frame gathering
        through the packer and prefetches the next batch."""
        monkeypatch.setenv("DIMO_DEVICE_DATA", "0")
        from dimo_tpu.io.synthetic import make_synthetic_videos
        from dimo_tpu.train.loop import Trainer
        from dimo_tpu.presets import tiny_synthetic_opt as tiny_opt
        images, masks, meta = make_synthetic_videos(
            num_motions=2, num_views=3, num_frames=5, ref_size=32,
            n_gauss=20, seed=0)
        tr = Trainer(tiny_opt(), images, masks, meta)
        batch, shape = tr.sample_batch()
        assert tr._packer is not None
        assert tr._pending_meta is not None   # prefetch submitted
        b = int(batch["times"].shape[0])
        # gt rows must match the sampled (m, v, f) tuples
        flat_imgs = images.reshape((-1,) + images.shape[3:])
        # consume the prefetched batch too and check correctness
        meta2 = tr._pending_meta
        batch2, _ = tr.sample_batch()
        np.testing.assert_array_equal(np.asarray(batch2["gt_image"]),
                                      flat_imgs[meta2["flat"]])
