from . import graphics, image, lr_schedule, quaternions, sh, timing  # noqa: F401
