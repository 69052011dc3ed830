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
