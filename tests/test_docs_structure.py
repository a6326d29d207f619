"""Structural checks for the sphinx tree (sphinx itself is only
available in CI): every toctree entry must resolve to a file inside
the source dir, and no document may escape it with ../ paths — the
failure mode that broke the first docs CI job."""

import os
import re

DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'docs')


def _toctree_entries(rst_path):
    entries = []
    in_tree = False
    for line in open(rst_path):
        if line.strip() == '.. toctree::':
            in_tree = True
            continue
        if in_tree:
            s = line.strip()
            if not s:
                continue
            if s.startswith(':'):
                continue
            if not line.startswith(('   ', '\t')):
                in_tree = False
                continue
            entries.append(s)
    return entries


def test_index_toctree_resolves():
    index = os.path.join(DOCS, 'index.rst')
    entries = _toctree_entries(index)
    assert entries, 'no toctree entries found'
    for e in entries:
        assert not e.startswith('..'), (
            'toctree entry escapes the source dir: %s' % e)
        cands = [os.path.join(DOCS, e + ext)
                 for ext in ('.rst', '.md')]
        assert any(os.path.isfile(c) for c in cands), (
            'toctree entry has no document: %s' % e)


def test_conf_excludes_committed_api_markdown():
    conf = open(os.path.join(DOCS, 'conf.py')).read()
    m = re.search(r'exclude_patterns\s*=\s*\[([^\]]*)\]', conf)
    assert m and "'api'" in m.group(1), (
        'docs/api (committed markdown) must be excluded from the '
        'sphinx build or every page raises a not-in-toctree warning '
        'under -W')
