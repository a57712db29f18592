"""Docs-tree sanity: the Sphinx site (docs/) must reference real modules.

The image used for unit tests has no sphinx; CI builds the site with
``sphinx-build -W`` (see .github/workflows/tests.yml).  These checks
catch the common breakages locally: an ``automodule`` target that does
not import, a toctree entry without a source file, and syntactically
broken conf.py.
"""
import importlib
import os
import re

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs")


def _rst_files():
    return [f for f in os.listdir(DOCS) if f.endswith(".rst")]


def test_automodule_targets_import():
    pat = re.compile(r"^\.\.\s+automodule::\s+(\S+)", re.M)
    targets = set()
    for f in _rst_files():
        with open(os.path.join(DOCS, f)) as fh:
            targets.update(pat.findall(fh.read()))
    assert targets, "no automodule directives found"
    for mod in sorted(targets):
        importlib.import_module(mod)


def test_toctree_entries_exist():
    with open(os.path.join(DOCS, "index.rst")) as fh:
        text = fh.read()
    entries = re.findall(r"^\s{4}([a-z_0-9]+)\s*$", text, re.M)
    assert entries, "no toctree entries found"
    for e in entries:
        assert os.path.exists(os.path.join(DOCS, e + ".rst")) or os.path.exists(
            os.path.join(DOCS, e + ".md")
        ), f"toctree entry {e} has no source file"


def test_conf_compiles():
    with open(os.path.join(DOCS, "conf.py")) as fh:
        compile(fh.read(), "conf.py", "exec")
