"""Test-only pkg_resources shim (setuptools is absent in this image).
The reference only calls resource_filename to locate packaged data files."""

import os


def resource_filename(package, resource):
    mod = __import__(package, fromlist=["__file__"])
    return os.path.join(os.path.dirname(mod.__file__), resource)
