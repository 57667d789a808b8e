"""FPGA-friendly pipeline: integer channels, bank-restricted quantized training.

Parity with /root/reference/waldboost/fpga/: same capabilities, implemented
on the framework's device kernels.
"""

from .banks import BankScheduler, PixelBanks  # noqa: F401
from .channels import grad_hist_4_u1, grad_mag_u1  # noqa: F401
from .training import DTree, train  # noqa: F401
