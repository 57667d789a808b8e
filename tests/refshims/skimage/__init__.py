"""Test-only skimage shim (see transform.resize)."""
