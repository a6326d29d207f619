#!/usr/bin/env python
"""Generate the builtin offline mini dye library
(enspara_tpu/data/dyes_builtin).

The full FRET dye library (fetched by enspara_tpu.data.
fetch_dye_library) is GPLv3 and therefore not bundled in this MIT
package. Air-gapped installs still need SOMETHING to run the smFRET
quickstart against, so this script procedurally generates a minimal,
ORIGINAL, MIT-licensed library of two synthetic dyes ("SimFluor 488"
donor, "SimFluor 594" acceptor):

- point clouds from a simple accessible-volume model: dye positions
  sampled over a linker-length radial shell inside an upward cone
  (the half-space a residue's side chain can actually reach),
  deterministic under a fixed seed;
- excitation/emission spectra as skewed Gaussians with Stokes shifts,
  peak wavelengths/QD/extinction/lifetime values typical of
  green-donor/red-acceptor pairs (physical constants of that CLASS of
  dye, not any vendor's measured curves);
- the Dyes_extinction_QD.csv row layout and libraries.yml schema the
  smFRET stack expects (see geometry/explicit_r0_calc.py:62-107).

These dyes are for pipeline validation and tutorials: the numbers are
physically plausible (R0 ~ 5 nm for this pair) but are NOT
measurements of any real fluorophore. For science, fetch the real
library.

Deterministic: running this twice writes byte-identical files.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DEST = os.path.join(os.path.dirname(HERE), 'enspara_tpu', 'data',
                    'dyes_builtin')

# (name tag, pdb stem, linker reach nm, ex peak nm, em peak nm,
#  extinction 1/M/cm, quantum yield, lifetime ns)
DYES = (
    # chromophore ids are deliberately non-numeric ("488D"): pandas
    # reads the headerless Dyes_extinction_QD.csv with string ids as
    # object dtype, matching how explicit_r0_calc.get_dye_overlap
    # compares them (an all-integer column would silently never match)
    ('SimFluor 488D', 'SF488', 1.15, 492.0, 517.0, 75000.0, 0.90, 4.0),
    ('SimFluor 594A', 'SF594', 1.30, 592.0, 618.0, 90000.0, 0.65, 3.8),
)


def accessible_volume_cloud(rng, n_points, reach_nm):
    """Accessible-volume point cloud (nm): radial shell between 35%
    and 100% of the linker reach, restricted to a cone of half-angle
    ~75 deg about +z (the direction away from the protein surface the
    CB frame defines), with a soft radial peak near 85% reach."""
    pts = []
    while len(pts) < n_points:
        m = 4 * (n_points - len(pts))
        # radius: triangular-ish density rising to 0.85*reach
        u = rng.random(m)
        r = reach_nm * (0.35 + 0.65 * np.sqrt(u) * 0.95)
        cos_min = np.cos(np.deg2rad(75.0))
        ct = cos_min + (1 - cos_min) * rng.random(m)
        st = np.sqrt(1 - ct ** 2)
        phi = 2 * np.pi * rng.random(m)
        cand = np.stack([r * st * np.cos(phi),
                         r * st * np.sin(phi),
                         r * ct], axis=1)
        # carve a small self-exclusion sphere where the linker anchors
        cand = cand[np.linalg.norm(cand, axis=1) > 0.3 * reach_nm]
        pts.extend(cand.tolist())
    return np.asarray(pts[:n_points])


def write_cloud_pdb(path, cloud_nm):
    """Minimal one-model PDB of carbon pseudo-atoms (coords in
    Angstrom, as the PDB format requires)."""
    xyz = cloud_nm * 10.0
    lines = ['MODEL        0']
    for i, (x, y, z) in enumerate(xyz, start=1):
        lines.append(
            'ATOM  %5d  C   DYE A   1    %8.3f%8.3f%8.3f  1.00  0.00'
            '           C' % (i, x, y, z))
    lines += ['TER', 'ENDMDL', 'END', '']
    with open(path, 'w') as f:
        f.write('\n'.join(lines))


def skewed_gaussian(wl, peak, width, skew):
    """Asymmetric band shape: wider on the chosen side of the peak
    (real dye spectra tail to the blue in excitation and to the red in
    emission)."""
    sigma = np.where((wl > peak) == (skew > 0),
                     width * (1 + abs(skew)), width)
    return np.exp(-0.5 * ((wl - peak) / sigma) ** 2)


def write_spectrum_csv(path, ex_peak, em_peak):
    wl = np.arange(300, 801)
    ex = 100.0 * skewed_gaussian(wl, ex_peak, 22.0, -0.8)
    em = 100.0 * skewed_gaussian(wl, em_peak, 24.0, +0.9)
    with open(path, 'w') as f:
        f.write('Wavelength,Excitation,Emission\n')
        for w, e, m in zip(wl, ex, em):
            f.write('%d,%.5f,%.5f\n' % (w, e, m))


def main():
    rng = np.random.default_rng(20260821)
    os.makedirs(os.path.join(DEST, 'point-clouds'), exist_ok=True)
    os.makedirs(os.path.join(DEST, 'R0'), exist_ok=True)

    yml = []
    qd_rows = []
    for (name, stem, reach, ex_peak, em_peak,
         ext, qd, tau) in DYES:
        cloud = accessible_volume_cloud(rng, 384, reach)
        write_cloud_pdb(
            os.path.join(DEST, 'point-clouds', '%s.pdb' % stem), cloud)
        write_spectrum_csv(
            os.path.join(DEST, 'R0', '%s.csv' % name.replace(' ', '')),
            ex_peak, em_peak)
        fluor, number = name.split(' ')
        qd_rows.append('%s,%s,%.1f,%.3f,%.2f'
                       % (fluor, number, ext, qd, tau))
        yml.extend([
            '%s C1R:' % name,
            '  author: enspara_tpu (procedurally generated)',
            '  citation: tools/make_builtin_dyes.py',
            '  filename: %s' % stem,
            '  licence: MIT',
            '  mu:',
            '  - C',
            '  - C',
            '  negative: []',
            '  positive: []',
            '  r:',
            '  - C',
            '  CB:',
            '  - name C',
        ])

    with open(os.path.join(DEST, 'R0', 'Dyes_extinction_QD.csv'),
              'w') as f:
        f.write('\n'.join(qd_rows) + '\n')
    with open(os.path.join(DEST, 'libraries.yml'), 'w') as f:
        f.write('\n'.join(yml) + '\n')
    with open(os.path.join(DEST, 'README.md'), 'w') as f:
        f.write(
            '# Builtin mini dye library (synthetic)\n\n'
            'Two procedurally generated dyes (SimFluor 488 donor, '
            'SimFluor 594 acceptor)\nfor offline validation and '
            'tutorials: accessible-volume point clouds,\nskewed-'
            'Gaussian spectra, and typical-of-class photophysical '
            'constants.\nGenerated by `tools/make_builtin_dyes.py` '
            '(deterministic); MIT licensed.\n\nThese are NOT '
            'measurements of real fluorophores. For science, run\n'
            '`python -m enspara_tpu.data.fetch_dye_library` to get '
            'the real library\n(GPLv3, kept out of this package).\n')
    print('wrote %s' % DEST)


if __name__ == '__main__':
    main()
