#!/usr/bin/env python
"""Generate the markdown API reference (docs/api/) from the package's
docstrings.

Self-contained (stdlib inspect only) so the reference can be rebuilt
and diffed in any environment — the sphinx tree (docs/sphinx/) wraps
the same modules with autodoc for the HTML build in CI, but the
committed markdown is what ships with the repo and what
tests/test_api_docs.py keeps in sync with the code.

Usage: python tools/gen_api_docs.py [--check]
  --check: exit 1 if the committed files differ from a fresh render
"""

import argparse
import importlib
import inspect
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, 'docs', 'api')
sys.path.insert(0, REPO)

# module -> one-line blurb; order = table of contents
MODULES = [
    ('enspara_tpu.ra', 'Ragged trajectory collections (host core + '
                       'device views)'),
    ('enspara_tpu.cluster', 'Geometric clustering: k-centers, '
                            'k-medoids, k-hybrid'),
    ('enspara_tpu.cluster.engine', 'Device clustering engine '
                                   '(fused/sharded loops)'),
    ('enspara_tpu.cluster.util', 'Assignment, batching, loaders, '
                                 'ClusterResult'),
    ('enspara_tpu.msm', 'MSM estimation: counting, builders, '
                        'eigenspectra, trimming'),
    ('enspara_tpu.msm.builders', 'Counts -> transition-probability '
                                 'estimators'),
    ('enspara_tpu.msm.transition_matrices', 'Transition counting, '
                                            'trimming, eigenspectra'),
    ('enspara_tpu.msm.eigen_device', 'Device eigensolvers and fused '
                                     'timescale programs'),
    ('enspara_tpu.msm.timescales', 'Implied timescales'),
    ('enspara_tpu.msm.bace', 'Bayesian agglomerative coarse-graining'),
    ('enspara_tpu.msm.bootstrap', 'Bootstrapped MSM ensembles'),
    ('enspara_tpu.msm.synthetic_data', 'Synthetic trajectories and '
                                       'ensembles'),
    ('enspara_tpu.tpt', 'Transition path theory: committors, MFPTs, '
                        'fluxes, pathways'),
    ('enspara_tpu.info_theory', 'Mutual information, entropies, '
                                'exposons'),
    ('enspara_tpu.cards', 'CARDS correlation-of-dynamics analysis'),
    ('enspara_tpu.geometry', 'Rotamers, pockets, RMSF, helices, '
                             'dyes, SASA'),
    ('enspara_tpu.io', 'Trajectory/topology I/O (XTC, TRR, DCD, '
                       'HDF5, NetCDF, GRO, PDB)'),
    ('enspara_tpu.parallel', 'Device mesh, collectives, striped '
                             'multi-host loaders'),
    ('enspara_tpu.ops', 'Pallas/XLA compute kernels'),
    ('enspara_tpu.util', 'Loading, logging, checkpointing, '
                         'parallel helpers'),
    ('enspara_tpu.apps', 'Command-line applications'),
]


def _public_members(mod):
    names = getattr(mod, '__all__', None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith('_')]
    out = []
    for n in sorted(names):
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        # keep only objects defined inside the package
        owner = getattr(obj, '__module__', '') or ''
        if not owner.startswith('enspara_tpu'):
            continue
        out.append((n, obj))
    return out


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return '(...)'


def _first_paragraph(doc):
    if not doc:
        return '*(undocumented)*'
    paras = inspect.cleandoc(doc).split('\n\n')
    return paras[0].replace('\n', ' ')


def _submodule_index(mod):
    """For packages: one line per child module (name + first docstring
    paragraph), so pages like `apps`/`ops` document their contents."""
    import pkgutil
    if not hasattr(mod, '__path__'):
        return []
    lines = []
    for info in sorted(pkgutil.iter_modules(mod.__path__),
                       key=lambda i: i.name):
        if info.name.startswith('_'):
            continue
        try:
            child = importlib.import_module(
                '%s.%s' % (mod.__name__, info.name))
        except Exception:
            continue
        lines.append('- **`%s`** — %s'
                     % (info.name, _first_paragraph(child.__doc__)))
    if lines:
        return ['## Modules', ''] + lines + ['']
    return []


def render_module(name, blurb):
    mod = importlib.import_module(name)
    lines = ['# `%s`' % name, '', blurb + '.', '']
    mdoc = inspect.getdoc(mod)
    if mdoc:
        lines += [mdoc, '']
    lines += _submodule_index(mod)
    classes, functions = [], []
    for n, obj in _public_members(mod):
        (classes if inspect.isclass(obj) else functions).append((n, obj))

    if classes:
        lines += ['## Classes', '']
        for n, cls in classes:
            lines += ['### `%s%s`' % (n, _signature(cls)), '',
                      _first_paragraph(cls.__doc__), '']
            methods = [(mn, mo) for mn, mo in
                       inspect.getmembers(cls, inspect.isfunction)
                       if not mn.startswith('_')]
            for mn, mo in methods:
                lines += ['- **`.%s%s`** — %s'
                          % (mn, _signature(mo),
                             _first_paragraph(mo.__doc__))]
            if methods:
                lines.append('')
    if functions:
        lines += ['## Functions', '']
        for n, fn in functions:
            lines += ['### `%s%s`' % (n, _signature(fn)), '',
                      _first_paragraph(fn.__doc__), '']
    return '\n'.join(lines) + '\n'


def render_index():
    lines = ['# API reference', '',
             'Generated from docstrings by `tools/gen_api_docs.py` '
             '(regenerate after changing public APIs; '
             '`tests/test_api_docs.py` enforces freshness).', '']
    for name, blurb in MODULES:
        stem = name.replace('.', '_')
        lines.append('- [`%s`](%s.md) — %s' % (name, stem, blurb))
    return '\n'.join(lines) + '\n'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true')
    args = ap.parse_args()

    rendered = {'index.md': render_index()}
    for name, blurb in MODULES:
        rendered['%s.md' % name.replace('.', '_')] = \
            render_module(name, blurb)

    if args.check:
        stale = []
        for fn, text in rendered.items():
            p = os.path.join(OUT, fn)
            if not os.path.exists(p) or open(p).read() != text:
                stale.append(fn)
        if stale:
            print('stale API docs (rerun tools/gen_api_docs.py): %s'
                  % ', '.join(stale))
            return 1
        print('API docs up to date (%d pages)' % len(rendered))
        return 0

    os.makedirs(OUT, exist_ok=True)
    for fn, text in rendered.items():
        with open(os.path.join(OUT, fn), 'w') as f:
            f.write(text)
    print('wrote %d pages to %s' % (len(rendered), OUT))
    return 0


if __name__ == '__main__':
    sys.exit(main())
