"""The shipping data path: fetch_dye_library against a local fixture
tarball (no network), manifest verification, and the runtime dye-dir
resolution order. VERDICT r2 item 7: the fetch path must be exercised
end-to-end by the suite, not just shipped.
"""

import io
import os
import tarfile

import pytest

from enspara_tpu.data import dye_library_path
from enspara_tpu.data.fetch_dye_library import (fetch, subtree_manifest,
                                                SUBTREE)

FIXTURE_FILES = {
    'libraries.yml': b"AF488:\n  R0: 5.2\n",
    'point-clouds/AF488_cloud.npy': b'\x93NUMPY-fake',
    'R0/overlap.csv': b'wavelength,eps\n450,21000\n',
    'structures/AF488.pdb': b'ATOM      1  C   DYE A   1\n',
}


def _make_tarball(tmp_path, files=FIXTURE_FILES, top='enspara-test',
                  extra_members=()):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode='w:gz') as tar:
        for rel, data in files.items():
            info = tarfile.TarInfo('%s/%s%s' % (top, SUBTREE, rel))
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        for name, data in extra_members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    path = tmp_path / 'fixture.tar.gz'
    path.write_bytes(buf.getvalue())
    return 'file://' + str(path)


def test_fetch_from_local_tarball(tmp_path, capsys):
    url = _make_tarball(tmp_path)
    dest = tmp_path / 'dyes'
    out = fetch(dest=str(dest), url=url)
    assert out == str(dest)
    for rel, data in FIXTURE_FILES.items():
        assert (dest / rel).read_bytes() == data
    # url override without expected manifest => explicit warning
    assert 'UNVERIFIED' in capsys.readouterr().out


def test_fetch_verifies_manifest(tmp_path):
    url = _make_tarball(tmp_path)
    dest = tmp_path / 'dyes'
    good = fetch(dest=str(dest / 'probe'), url=url)
    manifest = subtree_manifest(good)

    # correct manifest accepted
    fetch(dest=str(dest), url=url, expect_manifest=manifest)
    assert (dest / 'libraries.yml').exists()

    # wrong manifest rejected, nothing installed
    with pytest.raises(RuntimeError, match='manifest mismatch'):
        fetch(dest=str(tmp_path / 'bad'), url=url,
              expect_manifest='0' * 64)
    assert not (tmp_path / 'bad').exists()


def test_fetch_ignores_traversal_and_foreign_members(tmp_path):
    url = _make_tarball(
        tmp_path,
        extra_members=[
            ('enspara-test/%s../../escape.txt' % SUBTREE, b'x'),
            ('enspara-test/enspara/other/file.txt', b'y'),
        ])
    dest = tmp_path / 'dyes'
    fetch(dest=str(dest), url=url)
    assert not (tmp_path / 'escape.txt').exists()
    assert not (dest / '..' / '..' / 'escape.txt').exists()
    installed = {os.path.relpath(os.path.join(dp, f), dest)
                 for dp, _, fns in os.walk(dest) for f in fns}
    assert installed == set(FIXTURE_FILES)


def test_fetch_rejects_empty_subtree(tmp_path):
    url = _make_tarball(tmp_path, files={},
                        extra_members=[('enspara-test/README', b'z')])
    with pytest.raises(RuntimeError, match='no files under'):
        fetch(dest=str(tmp_path / 'dyes'), url=url)


def test_dye_dir_resolution_prefers_env_then_fetched(tmp_path,
                                                     monkeypatch):
    fetched = tmp_path / 'fetched'
    fetched.mkdir()
    env_dir = tmp_path / 'env'
    env_dir.mkdir()

    import enspara_tpu.data as data_pkg
    monkeypatch.setattr(data_pkg, '_HERE', str(tmp_path))
    monkeypatch.setenv('ENSPARA_TPU_DYE_DIR', str(env_dir))
    assert dye_library_path() == str(env_dir)

    monkeypatch.delenv('ENSPARA_TPU_DYE_DIR')
    monkeypatch.delenv('ENSPARA_TPU_USE_REFERENCE_DATA',
                       raising=False)
    (tmp_path / 'dyes').mkdir()
    assert dye_library_path() == str(tmp_path / 'dyes')


def test_smfret_load_library_from_fetched_layout(tmp_path,
                                                 monkeypatch):
    """The smFRET stack must run from a fetch-shaped layout with the
    reference checkout opt-out unset — the shipping configuration.
    Uses the real dye data staged into a tmp dir the way fetch()
    lays it out (reference: explicit_r0_calc.py:26 load_library)."""
    import shutil

    src = dye_library_path(required=False)
    if src is None or not os.path.isdir(src):
        pytest.skip('no dye library available to stage the fixture')
    staged = tmp_path / 'dyes'
    shutil.copytree(src, staged)

    monkeypatch.setenv('ENSPARA_TPU_DYE_DIR', str(staged))
    monkeypatch.delenv('ENSPARA_TPU_USE_REFERENCE_DATA',
                       raising=False)

    from enspara_tpu.geometry.explicit_r0_calc import load_library
    lib = load_library()
    assert len(lib) > 0
    assert dye_library_path() == str(staged)
