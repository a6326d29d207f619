"""Guard the originality bar: no substantial function in the package
may reach 0.5 comment-stripped similarity against ANY function in ANY
reference source file (tools/simcheck.py --sweep, all-pairs and
cross-basename so renamed files cannot hide). Run in the slow tier;
the round-2 VERDICT showed the whole-file detector misses
function-level transcription and the round-3 VERDICT showed
basename-matched sweeps miss renamed files, so this is the regression
net for both."""

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
