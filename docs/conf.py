"""Sphinx configuration (reference: docs/conf.py — autodoc of the public
classes plus an nbsphinx-rendered demo notebook, docs/conf.py:35,64; no
C-extension mocking needed here since all kernels are JAX)."""

import os
import shutil
import sys

sys.path.insert(0, os.path.abspath('..'))

project = 'bayesbridge-tpu'
author = 'bayesbridge-tpu developers'

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
    'nbsphinx',
]

autodoc_mock_imports = ['jax', 'jaxlib', 'scipy', 'matplotlib']
exclude_patterns = ['_build', '**.ipynb_checkpoints']
html_theme = 'alabaster'

# The demo notebook lives in examples/; nbsphinx needs it inside the
# source tree, so stage a copy at build time (reference renders its
# demo the same way, docs/conf.py:64).
nbsphinx_execute = 'never'
_here = os.path.dirname(os.path.abspath(__file__))
_demo_src = os.path.join(_here, '..', 'examples', 'demo.ipynb')
if os.path.exists(_demo_src):
    shutil.copyfile(_demo_src, os.path.join(_here, 'demo.ipynb'))
