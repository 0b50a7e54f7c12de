"""Pure, static-shape, jittable numerical kernels (the TPU compute layer)."""

from . import peaks  # noqa: F401
