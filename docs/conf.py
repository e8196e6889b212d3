"""Sphinx configuration (reference: docs/conf.py — autodoc of the public
classes; no C-extension mocking needed here since all kernels are JAX)."""

import os
import sys

sys.path.insert(0, os.path.abspath('..'))

project = 'bayesbridge-tpu'
author = 'bayesbridge-tpu developers'

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
]

autodoc_mock_imports = ['jax', 'jaxlib', 'scipy', 'matplotlib']
exclude_patterns = ['_build']
html_theme = 'alabaster'
