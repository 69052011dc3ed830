"""ctypes bindings for the native runtime library (native/dimo_native.cpp).

Provides the C++ PLY fast path and the async batch packer. Every entry point
degrades gracefully to pure numpy when the library hasn't been built — run
scripts/build_native.sh to enable.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libdimo_native.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.ply_write_f32.restype = ctypes.c_int
    lib.ply_write_f32.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int, ctypes.c_void_p,
                                  ctypes.c_int64]
    lib.ply_read_f32_header.restype = ctypes.c_int64
    lib.ply_read_f32_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int]
    lib.ply_read_f32_data.restype = ctypes.c_int
    lib.ply_read_f32_data.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int]
    lib.packer_create.restype = ctypes.c_void_p
    lib.packer_create.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_int64]
    lib.packer_submit.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int, ctypes.c_void_p,
                                  ctypes.c_void_p]
    lib.packer_wait.argtypes = [ctypes.c_void_p]
    lib.packer_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _find_lib() is not None


# ---------------------------------------------------------------------------
# PLY fast path

def ply_write(path: str, names: list[str], columns: np.ndarray) -> bool:
    """Write binary f32 PLY via C++. Returns False if unavailable/failed."""
    lib = _find_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(columns, dtype=np.float32)
    names_blob = b"".join(n.encode() + b"\0" for n in names)
    rc = lib.ply_write_f32(path.encode(), names_blob, len(names),
                           data.ctypes.data_as(ctypes.c_void_p),
                           data.shape[0])
    return rc == 0


def ply_read(path: str):
    """Read binary f32 PLY via C++ -> dict[name] = (N,) f32 array, or None."""
    lib = _find_lib()
    if lib is None:
        return None
    n_verts = ctypes.c_int64(0)
    n_props = ctypes.c_int(0)
    names_buf = ctypes.create_string_buffer(16384)
    off = lib.ply_read_f32_header(path.encode(), ctypes.byref(n_verts),
                                  ctypes.byref(n_props), names_buf,
                                  len(names_buf))
    if off < 0:
        return None
    names = names_buf.value.decode().strip("\n").split("\n")
    out = np.empty((n_verts.value, n_props.value), np.float32)
    rc = lib.ply_read_f32_data(path.encode(), off,
                               out.ctypes.data_as(ctypes.c_void_p),
                               n_verts.value, n_props.value)
    if rc != 0:
        return None
    return {name: out[:, i].copy() for i, name in enumerate(names)}


# ---------------------------------------------------------------------------
# async batch packer

class BatchPacker:
    """Double-buffered asynchronous frame gatherer.

    images: (F_total, ...) u8 contiguous; masks: (F_total, ...) u8.
    submit(indices) starts packing on the worker thread; get() blocks for
    the previously submitted batch — call submit for step k+1 before
    consuming step k to overlap host packing with device compute.
    """

    def __init__(self, images: np.ndarray, masks: np.ndarray, batch: int,
                 slots: int = 2):
        lib = _find_lib()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        self.images = np.ascontiguousarray(images)
        self.masks = np.ascontiguousarray(masks)
        self.img_bytes = int(np.prod(self.images.shape[1:]))
        self.mask_bytes = int(np.prod(self.masks.shape[1:]))
        # double-buffered out slots: the worker packs batch k+1 into slot
        # (k+1) % slots while slot k % slots is being uploaded to the device
        self._slots = slots
        self.out_imgs = [np.empty((batch,) + self.images.shape[1:], np.uint8)
                         for _ in range(slots)]
        self.out_masks = [np.empty((batch,) + self.masks.shape[1:], np.uint8)
                          for _ in range(slots)]
        self._submits = 0
        self._gets = 0
        self._idx_keepalive = [None] * slots
        self._h = lib.packer_create(
            self.images.ctypes.data_as(ctypes.c_void_p),
            self.masks.ctypes.data_as(ctypes.c_void_p),
            self.img_bytes, self.mask_bytes)

    def submit(self, flat_indices: np.ndarray) -> None:
        slot = self._submits % self._slots
        idx = np.ascontiguousarray(flat_indices, dtype=np.int64)
        assert idx.shape[0] == self.out_imgs[slot].shape[0]
        self._idx_keepalive[slot] = idx
        self._lib.packer_submit(
            self._h, idx.ctypes.data_as(ctypes.c_void_p), idx.shape[0],
            self.out_imgs[slot].ctypes.data_as(ctypes.c_void_p),
            self.out_masks[slot].ctypes.data_as(ctypes.c_void_p))
        self._submits += 1

    def get(self) -> tuple[np.ndarray, np.ndarray]:
        """Blocks until all submitted jobs finish; returns the oldest
        un-consumed slot's buffers."""
        self._lib.packer_wait(self._h)
        slot = self._gets % self._slots
        self._gets += 1
        return self.out_imgs[slot], self.out_masks[slot]

    def close(self) -> None:
        if self._h:
            self._lib.packer_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
