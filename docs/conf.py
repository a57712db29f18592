# Sphinx configuration for the commpy-tpu documentation site.
#
# Mirrors the reference's doc/ tree (reference doc/conf.py, doc/index.rst):
# an index listing available features plus per-module autodoc pages over
# the CommPy-compatible API, extended with the TPU-native layers (ops,
# kernels, parallel, models) the reference does not have.
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "commpy-tpu"
copyright = "2026, commpy-tpu contributors"
author = "commpy-tpu contributors"

try:
    from commpy_tpu import __version__ as release
except Exception:  # pragma: no cover - docs build without install
    release = "0.1"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
    "myst_parser",
]

autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_typehints = "description"
napoleon_numpy_docstring = True
napoleon_google_docstring = False

# The markdown guides (architecture, FEC tutorial, parity matrix) are
# first-class pages.
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

templates_path = []
exclude_patterns = ["_build"]

html_theme = "alabaster"
html_static_path = []
