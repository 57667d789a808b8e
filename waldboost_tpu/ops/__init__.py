"""Device kernels and compute primitives (XLA + Pallas)."""

from . import cascade, fit, image  # noqa: F401
