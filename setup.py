"""Setuptools shim (metadata lives in pyproject.toml).

Exists so ``pip install -e . --no-use-pep517`` works in offline
environments without the ``wheel`` package (the PEP 660 editable path
needs bdist_wheel); with network access, plain ``pip install -e .``
uses pyproject.toml directly. Console-script parity with the reference
engine's /root/reference/setup.py:24-29.
"""

from setuptools import setup

setup()
