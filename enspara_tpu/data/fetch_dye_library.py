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
import hashlib
import io
import os
import shutil
import sys
import tarfile
import urllib.request

TARBALL = 'https://codeload.github.com/bowman-lab/enspara/tar.gz/{ref}'
SUBTREE = 'enspara/data/dyes/'

# Release ref this library's smFRET stack was validated against; this
# is scientific oracle data, so the default fetch is PINNED — both the
# ref and a content manifest of the extracted subtree. An upstream
# change (or a tampered tarball) fails loudly instead of silently
# altering downstream R0/lifetime numbers. The manifest hashes file
# CONTENTS (sha256 of "relpath sha256" lines, sorted), so it is stable
# across tarball recompression, unlike a tarball checksum.
PINNED_REF = 'v0.3.1'
# sha256 manifest of enspara/data/dyes at the validation checkout
# (79 files; see tools/dye_manifest.py to recompute)
PINNED_MANIFEST = \
    '73847ff657ecc731d266ea0ea12e4396d063dc50d7317f0dc3e01857abb300c1'
MAX_DOWNLOAD_BYTES = 256 * 1024 * 1024       # the repo tarball is ~50 MB


def subtree_manifest(root):
    """Content manifest of a directory tree: sha256 over sorted
    ``"relpath sha256(file)"`` lines. Stable across tar/gzip metadata,
    filesystem ordering, and mtimes."""
    entries = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for fn in sorted(filenames):
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root).replace(os.sep, '/')
            with open(p, 'rb') as f:
                h = hashlib.sha256(f.read()).hexdigest()
            entries.append('%s %s' % (rel, h))
    entries.sort()
    return hashlib.sha256('\n'.join(entries).encode()).hexdigest()


def fetch(dest=None, ref=None, url=None, expect_manifest=None):
    """Download the dye library subtree into ``dest``. Returns dest.

    With no ``ref``/``url`` override the pinned release is fetched and
    the extracted subtree is verified against ``PINNED_MANIFEST``.
    Overriding ``ref`` or ``url`` skips verification (with a warning)
    unless ``expect_manifest`` supplies a hash to check instead.
    """
    from . import _HERE

    pinned = ref is None and url is None
    if pinned:
        ref = PINNED_REF
        expect_manifest = PINNED_MANIFEST
    dest = dest or os.path.join(_HERE, 'dyes')
    url = url or TARBALL.format(ref=ref)

    print('Downloading %s ...' % url)
    with urllib.request.urlopen(url) as resp:
        raw = resp.read(MAX_DOWNLOAD_BYTES + 1)
        if len(raw) > MAX_DOWNLOAD_BYTES:
            raise RuntimeError(
                'refusing download > %d MB from %s'
                % (MAX_DOWNLOAD_BYTES // 2**20, url))
        buf = io.BytesIO(raw)

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

    if expect_manifest:
        got = subtree_manifest(tmp)
        if got != expect_manifest:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                'dye library manifest mismatch for %s: expected %s, '
                'got %s. The upstream data changed (or the download '
                'was tampered with); pass --ref/--url explicitly to '
                'accept a different dataset.' % (url, expect_manifest,
                                                 got))
        print('Verified subtree manifest %s' % got)
    else:
        print('WARNING: --ref/--url override given without an '
              'expected manifest; the downloaded data is UNVERIFIED.')

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
    p.add_argument('--ref', default=None,
                   help='upstream git ref to fetch (default: the '
                        'pinned, manifest-verified release %s; an '
                        'explicit ref skips verification)'
                        % PINNED_REF)
    p.add_argument('--url', default=None,
                   help='override the tarball URL entirely (e.g. a '
                        'local mirror; skips verification)')
    p.add_argument('--expect-manifest', default=None,
                   help='subtree manifest sha256 to verify an '
                        'overridden --ref/--url download against')
    args = p.parse_args(argv)
    fetch(dest=args.dest, ref=args.ref, url=args.url,
          expect_manifest=args.expect_manifest)
    return 0


if __name__ == '__main__':
    sys.exit(main())
