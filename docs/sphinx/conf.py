# Sphinx configuration for the HTML API/manual build (CI job `docs`).
# Mirrors the reference's docs/source/conf.py role: autodoc over the
# installed package plus the executable markdown tutorials via MyST.
# Build: pip install sphinx myst-parser && sphinx-build -W docs/sphinx out

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), '..', '..')))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

project = 'enspara-tpu'
author = 'enspara-tpu developers'
release = '0.1.0'

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.autosummary',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
    'myst_parser',
]

autosummary_generate = True
autodoc_member_order = 'bysource'
autodoc_default_options = {
    'members': True,
    'undoc-members': False,
    'show-inheritance': True,
}
napoleon_numpy_docstring = True

source_suffix = {'.rst': 'restructuredtext', '.md': 'markdown'}
exclude_patterns = ['_build']
html_theme = 'alabaster'
