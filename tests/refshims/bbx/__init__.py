"""Test-only bbx shim: re-exports waldboost_tpu.boxes, which rebuilds the
external bbx package's consumed API surface (SURVEY.md §2 "bbx (external)").
Lets /root/reference/waldboost import and execute for golden-parity tests.
"""

from waldboost_tpu.boxes import (Boxes, concatenate, empty_boxes, iou,
                                 non_max_suppression, set_aspect_ratio,
                                 sort_by_field, boxes_in_window)

from . import boxes  # noqa: F401  (reference does `from bbx.boxes import Boxes`)

__version__ = "0.0.7-shim"
