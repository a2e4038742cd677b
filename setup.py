"""Shim for environments without the ``wheel`` package (pip's PEP 517
path needs ``bdist_wheel``): ``pip install --no-use-pep517
--no-build-isolation -e .`` falls back to ``setup.py develop`` through
this file.  All metadata lives in pyproject.toml."""

from setuptools import setup

setup()
