"""FPGA-friendly pipeline: integer channels, bank-restricted training."""
