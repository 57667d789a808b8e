"""bbx.boxes submodule shim (reference imports ``from bbx.boxes import Boxes``)."""

from waldboost_tpu.boxes import Boxes  # noqa: F401
