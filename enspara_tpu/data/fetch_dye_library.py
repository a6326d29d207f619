"""Fetch the FRET dye library into the package data directory.

The reference bundles ~4 MB of GPLv3 dye data under
``enspara/data/dyes`` (structures/, point-clouds/, R0/, libraries.yml;
consumed at enspara/geometry/explicit_r0_calc.py:26). That data is
aggregated from published datasets:

- FRETpredict rotamer libraries (Montepietra, Tesei, Martins, Kunze,
  Best & Lindorff-Larsen, *Commun Biol* 7, 298 (2024),
  https://doi.org/10.1038/s42003-024-05910-6; GPLv3,
  https://github.com/KULL-Centre/FRETpredict)
- the Bowman-lab dye point clouds and R0 spectral-overlap tables
  shipped with enspara (GPLv3, https://github.com/bowman-lab/enspara)

This repository is MIT-licensed, so the GPLv3 data is NOT re-bundled;
this script downloads it from the upstream enspara repository into
``enspara_tpu/data/dyes`` (or ``--dest``). Run once per machine:

    python -m enspara_tpu.data.fetch_dye_library [--dest DIR] [--ref REF]

Cite the FRETpredict paper if you use the dye libraries.
"""

import argparse
import io
import os
import shutil
import sys
import tarfile
import urllib.request

TARBALL = 'https://codeload.github.com/bowman-lab/enspara/tar.gz/{ref}'
SUBTREE = 'enspara/data/dyes/'


def fetch(dest=None, ref='master', url=None):
    """Download the dye library subtree into ``dest``. Returns dest."""
    from . import _HERE

    dest = dest or os.path.join(_HERE, 'dyes')
    url = url or TARBALL.format(ref=ref)

    print('Downloading %s ...' % url)
    with urllib.request.urlopen(url) as resp:
        buf = io.BytesIO(resp.read())

    tmp = dest + '.partial'
    shutil.rmtree(tmp, ignore_errors=True)
    n = 0
    with tarfile.open(fileobj=buf, mode='r:gz') as tar:
        for member in tar.getmembers():
            # strip the top-level '<repo>-<ref>/' directory
            parts = member.name.split('/', 1)
            if len(parts) < 2 or not parts[1].startswith(SUBTREE):
                continue
            rel = parts[1][len(SUBTREE):]
            if not rel or not member.isfile():
                continue
            if rel.startswith(('/', '..')) or '/../' in rel:
                continue  # path traversal guard
            out = os.path.join(tmp, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with tar.extractfile(member) as src, open(out, 'wb') as dst:
                shutil.copyfileobj(src, dst)
            n += 1
    if n == 0:
        raise RuntimeError('no files under %s in %s' % (SUBTREE, url))

    shutil.rmtree(dest, ignore_errors=True)
    os.replace(tmp, dest)
    print('Installed %d dye-library files into %s' % (n, dest))
    print('This data is GPLv3 (FRETpredict / enspara); cite '
          'doi:10.1038/s42003-024-05910-6 if you use it.')
    return dest


def main(argv=None):
    p = argparse.ArgumentParser(
        description='Fetch the GPLv3 FRET dye library from the '
                    'upstream enspara repository.')
    p.add_argument('--dest', default=None,
                   help='target directory (default: the package data '
                        'dir, enspara_tpu/data/dyes)')
    p.add_argument('--ref', default='master',
                   help='upstream git ref to fetch (default: master)')
    p.add_argument('--url', default=None,
                   help='override the tarball URL entirely (e.g. a '
                        'local mirror)')
    args = p.parse_args(argv)
    fetch(dest=args.dest, ref=args.ref, url=args.url)
    return 0


if __name__ == '__main__':
    sys.exit(main())
