"""Every ```python block in docs/tutorials/*.md must RUN — the
tutorials are executable documentation (the reference ships sphinx
pages whose snippets can silently rot; here they are tested).

Blocks within one file execute in order in a shared namespace, with
the CWD set to a temp dir so file-writing examples stay contained. A
block preceded by an HTML comment `<!-- skip-test -->` (or
`<!-- skip-test: reason -->`) is exempt — used for examples that need
external files or hardware.
"""

import glob
import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'docs', 'tutorials')

# fences anchored at line start: prose that *mentions* ```python
# (e.g. the README index) must not be parsed as an open fence
BLOCK_RE = re.compile(
    r'(?P<skip><!--\s*skip-test[^>]*-->\s*\n)?'
    r'^```python\n(?P<code>.*?)^```', re.DOTALL | re.MULTILINE)


def _blocks(path):
    text = open(path).read()
    out = []
    for m in BLOCK_RE.finditer(text):
        line = text[:m.start()].count('\n') + 1
        out.append((line, bool(m.group('skip')), m.group('code')))
    return out


# README.md is the index page — no runnable snippets by design
TUTORIALS = sorted(p for p in glob.glob(os.path.join(DOCS, '*.md'))
                   if os.path.basename(p) != 'README.md')


@pytest.mark.parametrize(
    'path', TUTORIALS, ids=[os.path.basename(p) for p in TUTORIALS])
def test_tutorial_snippets_run(path, tmp_path, monkeypatch):
    blocks = _blocks(path)
    assert blocks, 'tutorial %s has no python blocks' % path
    monkeypatch.chdir(tmp_path)
    ns = {}
    ran = 0
    for line, skip, code in blocks:
        if skip:
            continue
        try:
            exec(compile(code, '%s:%d' % (path, line), 'exec'), ns)
        except Exception as e:
            pytest.fail('%s block at line %d failed: %s: %s'
                        % (os.path.basename(path), line,
                           type(e).__name__, e))
        ran += 1
    assert ran, 'all python blocks in %s are skip-tested' % path
