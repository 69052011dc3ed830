"""Dataset loader tests with real PNG files on disk."""
import json
import os

import numpy as np
import pytest

from dimo_tpu.io import dataset


@pytest.fixture()
def png_dataset(tmp_path):
    import cv2
    rng = np.random.RandomState(0)
    root = str(tmp_path)
    motions, views, frames, size = ["m0", "m1"], 2, 3, 32
    for m in motions:
        for v in range(views):
            d = os.path.join(root, m, f"view_{v:02d}")
            os.makedirs(d)
            for f in range(frames):
                rgb = rng.randint(0, 255, (size, size, 3), np.uint8)
                alpha = rng.randint(0, 255, (size, size, 1), np.uint8)
                rgba = np.concatenate([rgb, alpha], axis=-1)
                cv2.imwrite(os.path.join(d, f"{f:02d}.png"), rgba)
    with open(os.path.join(root, "info.json"), "w") as fp:
        json.dump({"azimuths_deg": [0, 180],
                   "full_azimuths_deg": [0, 120, 240],
                   "elevations_deg": [0, 0],
                   "input_videos": motions}, fp)
    return root, motions, views, frames, size


class TestLoadInfo:
    def test_reads_info_json(self, png_dataset):
        root, motions, views, frames, _ = png_dataset
        meta = dataset.load_info(root, views, frames, elevation=0)
        assert meta["input_videos"] == motions
        assert meta["azimuths"] == [0, 180]

    def test_fallback_without_info(self, tmp_path):
        os.makedirs(tmp_path / "zmotion")
        meta = dataset.load_info(str(tmp_path), 4, 8, elevation=15)
        assert meta["input_videos"] == ["zmotion"]
        assert len(meta["azimuths"]) == 4
        assert meta["elevations"] == [15] * 4

    def test_input_videos_string_split(self, png_dataset):
        root, _, views, frames, _ = png_dataset
        meta = dataset.load_info(root, views, frames, 0, input_videos="m1,m0")
        assert meta["input_videos"] == ["m1", "m0"]


class TestLoadVideos:
    def test_loads_rgba_with_alpha_masks(self, png_dataset):
        root, motions, views, frames, size = png_dataset
        images, masks = dataset.load_videos(root, motions, views, frames, size)
        assert images.shape == (2, views, frames, size, size, 3)
        assert masks.shape == (2, views, frames, size, size)
        assert images.max() > 0 and masks.max() > 0

    def test_resize_to_ref_size(self, png_dataset):
        root, motions, views, frames, _ = png_dataset
        images, masks = dataset.load_videos(root, motions, views, frames, 48)
        assert images.shape[-2] == 48 and masks.shape[-1] == 48

    def test_cached_npy_masks(self, tmp_path):
        """3-channel PNGs + cached _mask.npy files (the rembg-offline path)."""
        import cv2
        rng = np.random.RandomState(1)
        d = os.path.join(str(tmp_path), "mm", "view_00")
        os.makedirs(d)
        size = 16
        for f in range(2):
            rgb = rng.randint(0, 255, (size, size, 3), np.uint8)
            cv2.imwrite(os.path.join(d, f"{f:02d}.png"), rgb)
            np.save(os.path.join(d, f"{f:02d}_mask.npy"),
                    rng.rand(size, size, 1).astype(np.float32))
        images, masks = dataset.load_videos(str(tmp_path), ["mm"], 1, 2, size)
        assert masks.max() > 0

    def test_missing_mask_raises(self, tmp_path):
        import cv2
        d = os.path.join(str(tmp_path), "mm", "view_00")
        os.makedirs(d)
        cv2.imwrite(os.path.join(d, "00.png"),
                    np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(Exception, match="mask"):
            dataset.load_videos(str(tmp_path), ["mm"], 1, 1, 8)
