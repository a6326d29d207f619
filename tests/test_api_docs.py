"""The committed markdown API reference (docs/api) must match a fresh
render from the live docstrings — stale docs fail here, mirroring how
the reference keeps a sphinx-autodoc tree buildable in CI."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_docs_fresh():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'gen_api_docs.py'),
         '--check'],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
