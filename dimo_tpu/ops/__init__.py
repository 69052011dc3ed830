from dimo_tpu.ops import quat, sh, posenc, neighbors, image_losses  # noqa: F401
