"""Thin shim for environments whose setuptools predates integrated
bdist_wheel (PEP 660 editable installs need the `wheel` package there):
`pip install -e . --no-use-pep517 --no-build-isolation` uses this legacy
path. All metadata lives in pyproject.toml."""
from setuptools import setup

setup()
