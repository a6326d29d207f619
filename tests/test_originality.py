"""Guard the originality bar: no non-trivial function in the package
may reach 0.5 comment-stripped similarity against any same-named
reference file (tools/simcheck.py --sweep). Run in the slow tier; the
round-2 VERDICT showed the whole-file detector misses function-level
transcription, so this is the regression net for it."""

import os
import subprocess
import sys

import pytest

from _reference_oracle import HAVE_REF

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.skipif(not HAVE_REF, reason='reference tree not present')
def test_no_function_level_transcription():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'simcheck.py'),
         '--sweep'],
        cwd=REPO, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        'simcheck --sweep found transcribed functions:\n' + proc.stdout)
