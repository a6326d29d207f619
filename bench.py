#!/usr/bin/env python
"""Headline benchmark: the BASELINE north-star pipeline on-chip.

Runs the flagship pipeline (BASELINE.md: k-centers RMSD clustering of
1M frames to 1000 states + top-20 implied timescales) on whatever
devices are present and prints ONE COMPACT JSON line whose headline
metric is QCP-RMSD frame-center pair evaluations per second inside the
full clustering loop (global argmax + cross-shard center fetch +
distance kernel + min-update every iteration), measured with data
resident in HBM (the steady state of a production run).

Output contract (round-4 postmortem: the driver captures only the last
~2 KB of stdout, and the round-4 line outgrew it and recorded as a
truncated fragment):

  - stdout's LAST line is a compact JSON object (< ~1.5 KB): headline
    metric, the extra metric families (value/unit/vs_baseline only),
    run spread, retry count, backend, and a sha256 of the full record.
  - the FULL record (provenance, denominator notes, per-section times,
    contention annotations, best-record history) goes to
    ``benchmarks/bench-latest-result.json``.

Timing policy: every timed section is min-of-3; when a section's
max/min spread exceeds 1.5x (the dev tunnel contends with host CPU and
can inflate a single run 5x — round-3 postmortem), the whole batch of
3 is re-run, up to 2 retries, and the batch with the smallest spread
wins. A still-contended record is annotated instead of silently
becoming the round's number.

``vs_baseline`` denominators: the reference publishes no numbers
(BASELINE.md); pairs/s and frames/s normalize against an estimated
single-node reference throughput of 2.4e7 QCP pairs/s — mdtraj's
threaded C QCP kernel at ~1.5e6 pairs/s/core (64-atom structures) on a
16-core node, which is what `enspara.cluster` achieves on one machine
without MPI. The eigsolve family normalizes against the measured
reference CPU per-lag cost (benchmarks/reference-cpu-config2-result
.json: 3.48 s / 10 lags). The joint-counts family normalizes against
the measured reference `libinfo` CPU joint-histogram cost on this host
(benchmarks/reference-cpu-libinfo-result.json). Time-valued metrics
report ``vs_baseline = baseline_s / ours_s`` so >1 always means
faster.
"""

import hashlib
import json
import os
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC = 2.4e7   # estimated single-node enspara
REFERENCE_EIGSOLVE_S = 0.348      # measured: ref CPU lag scan / 10
NORTHSTAR_BUDGET_S = 60.0         # BASELINE north-star (v5p-8)
LAG = 10

N_FRAMES = 1_000_000
N_ATOMS = 64
N_CLUSTERS = 1000

_HERE = os.path.dirname(os.path.abspath(__file__))


def _backend_alive_once(timeout_s=180):
    """True if the default jax backend can initialize AND execute.
    Probed in a subprocess: a black-holed device tunnel can hang at
    either stage — backend init, or (the sneakier mode) init succeeds
    and the first compile/execute/fetch blocks forever — and either
    would hang this benchmark before it produces its JSON line. The
    probe therefore materializes a tiny matmul end to end."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, '-c',
             'import jax, jax.numpy as jnp, numpy as np;'
             'x = jnp.ones((128, 128));'
             'print(float(np.asarray(x @ x)[0, 0]))'],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0 and b'128' in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _backend_alive(attempts=3, backoff_s=(30, 60)):
    """Probe the device with retries: a transient tunnel outage should
    delay the benchmark by ~2 minutes, not erase the round's TPU
    record (round-2 postmortem: one failed probe degraded the official
    BENCH artifact to a CPU number while the chip was fine)."""
    for trial in range(attempts):
        if _backend_alive_once():
            return True
        if trial < attempts - 1:
            wait = backoff_s[min(trial, len(backoff_s) - 1)]
            print('# device probe %d/%d failed; retrying in %ds'
                  % (trial + 1, attempts, wait), flush=True)
            time.sleep(wait)
    return False


def _stage(msg):
    # progress markers on stderr (stdout stays one JSON line) so a
    # wall-clock watcher can tell a long remote compile from a hang
    import sys
    print('# %s %s' % (time.strftime('%H:%M:%S'), msg),
          file=sys.stderr, flush=True)


def _timed_section(fn, name, n_runs=3, spread_limit=1.5, retries=2):
    """min-of-``n_runs`` with bounded auto-retry of contended batches.

    Runs a batch of ``n_runs`` timings; if the batch's max/min spread
    exceeds ``spread_limit`` (tunnel/host contention signature), the
    batch is re-run up to ``retries`` times and the batch with the
    smallest spread wins — so a transient contention window heals
    itself instead of poisoning the round's number (round-4: a 2.21x
    spread left the round dependent on the committed prior record).

    Returns ``(times_of_winning_batch, n_retries_used)``.
    """
    def one_batch():
        ts = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return ts

    best = one_batch()
    used = 0
    while max(best) / min(best) > spread_limit and used < retries:
        used += 1
        _stage('%s: batch spread %.2fx > %.1fx; retry %d/%d'
               % (name, max(best) / min(best), spread_limit, used,
                  retries))
        cand = one_batch()
        if max(cand) / min(cand) < max(best) / min(best):
            best = cand
    return best, used


def main():
    global N_FRAMES, N_CLUSTERS
    degraded = False
    if not _backend_alive():
        # fall back to host so a tunnel outage still yields a
        # (clearly-annotated) result instead of a hang; shrink the
        # problem — the 1M x 1000 size is hours on a CPU core
        import jax
        jax.config.update('jax_platforms', 'cpu')
        degraded = True
        N_FRAMES, N_CLUSTERS = 20_000, 50

    from enspara_tpu.util.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from enspara_tpu.cluster.engine import (kcenters_device,
                                            kcenters_device_fused,
                                            prepare_rmsd_frames,
                                            prepare_sharded)
    from enspara_tpu.parallel import frame_mesh

    import jax
    import jax.numpy as jnp

    mesh = frame_mesh()

    # synthesize the dataset directly in HBM (no host->device
    # transfer): a correlated random walk so clustering structure is
    # nontrivial; precentered for the QCP kernels
    @jax.jit
    def synth(key):
        kb, kd, kn = jax.random.split(key, 3)
        base = jax.random.normal(kb, (N_ATOMS, 3), jnp.float32)
        drift = jax.random.normal(kd, (N_FRAMES, 1, 1), jnp.float32)
        noise = jax.random.normal(kn, (N_FRAMES, N_ATOMS, 3),
                                  jnp.float32)
        frames = base[None] + 0.3 * drift * base[None] + 0.1 * noise
        return frames - jnp.mean(frames, axis=1, keepdims=True)

    _stage('backend up: %s; synthesizing frames' % jax.default_backend())
    frames = synth(jax.random.PRNGKey(42))
    frames.block_until_ready()
    _stage('frames in HBM; preparing layout')
    if jax.default_backend() == 'tpu':
        # production steady state: frames ingested ONCE into the fused
        # kernels' device layout, then clustered (fp32)
        data = prepare_rmsd_frames(
            frames, mesh=mesh if mesh.size > 1 else None)

        def cluster(k):
            return kcenters_device_fused(
                data, n_clusters=k, k_max=N_CLUSTERS,
                mesh=mesh if mesh.size > 1 else None)
    else:
        data_sh, _ = prepare_sharded(frames, 'rmsd', mesh)

        def cluster(k):
            return kcenters_device(data_sh, metric='rmsd',
                                   n_clusters=k, k_max=N_CLUSTERS,
                                   mesh=mesh)

    # compile at the real shapes (tiny k, same static k_max)
    _stage('layout ready; compiling clustering loop')
    cluster(2)
    _stage('compiled; measuring')

    res_box = []

    def run_cluster():
        res_box.append(cluster(N_CLUSTERS))

    cluster_times, cluster_retries = _timed_section(
        run_cluster, 'cluster')
    res = res_box[-1]
    best = min(cluster_times)

    _stage('clustering measured; MSM tail')
    assert res.n_found == N_CLUSTERS
    assert res.assignments.max() == N_CLUSTERS - 1

    pairs = N_FRAMES * N_CLUSTERS
    pairs_per_sec = pairs / best
    frames_per_sec = N_FRAMES / best

    # optional bf16 frame-stream variant (TPU only): the loop is
    # HBM-bandwidth-bound, so halving the stream width ~doubles
    # throughput at ~4e-3 relative distance rounding (see
    # engine.kcenters_device_fused). Reported as an extra metric; the
    # headline stays fp32.
    bf16_extra = []
    if jax.default_backend() == 'tpu':
        try:
            _stage('bf16 variant: layout + compile')
            data16 = prepare_rmsd_frames(
                frames, mesh=mesh if mesh.size > 1 else None,
                precision='bf16')

            def cluster16():
                r16 = kcenters_device_fused(
                    data16, n_clusters=N_CLUSTERS, k_max=N_CLUSTERS,
                    mesh=mesh if mesh.size > 1 else None)
                assert r16.n_found == N_CLUSTERS

            kcenters_device_fused(
                data16, n_clusters=2, k_max=N_CLUSTERS,
                mesh=mesh if mesh.size > 1 else None)   # compile
            bf16_times, _ = _timed_section(cluster16, 'bf16', n_runs=1,
                                           retries=1)
            bf16_s = min(bf16_times)
            bf16_extra = [{
                'metric': 'kcenters_bf16_pairs_per_sec',
                'value': round(pairs / bf16_s, 1),
                'unit': 'pairs/s',
                'vs_baseline': round(
                    pairs / bf16_s / REFERENCE_PAIRS_PER_SEC, 3),
                'note': 'bfloat16 frame stream; ~4e-3 relative '
                        'distance rounding vs the fp32 headline'}]
        except Exception as err:   # optional metric must never kill
            _stage('bf16 variant failed (%s); skipping' % err)
            bf16_extra = []

    # steady-state loop rate (TPU only): the headline times the public
    # call, whose (dist, assig) result delivery crosses this box's dev
    # tunnel (~0.3 s for 8 MB — a production PCIe link pays ~1 ms).
    # This extra metric times the clustering loop itself with
    # device-side state init and an 8-byte result materialization, so
    # it reads the kernel rate a production deployment sees.
    loop_extra = []
    if jax.default_backend() == 'tpu':
        try:
            from enspara_tpu.cluster.engine import \
                _kcenters_loop_megafused_skip
            n_pad = data.frames_r.shape[1]

            @jax.jit
            def make_state():
                d0 = jnp.full((1, n_pad), jnp.inf, jnp.float32) \
                    .at[0, N_FRAMES:].set(-jnp.inf)
                a0 = jnp.full((1, n_pad), -1, jnp.int32)
                return d0, a0

            def run_loop():
                d0, a0 = make_state()
                out = _kcenters_loop_megafused_skip(
                    data.frames_r, data.g, d0, a0, np.int32(0),
                    np.int32(N_CLUSTERS), np.float32(0.0), N_CLUSTERS,
                    N_ATOMS, tile=data.tile)
                assert int(np.asarray(out[3])) == N_CLUSTERS  # 8 bytes

            run_loop()   # compile
            loop_times, _ = _timed_section(run_loop, 'loop-rate')
            loop_extra = [{
                'metric': 'kcenters_loop_pairs_per_sec',
                'value': round(pairs / min(loop_times), 1),
                'unit': 'pairs/s',
                'vs_baseline': round(
                    pairs / min(loop_times) / REFERENCE_PAIRS_PER_SEC,
                    3),
                'note': 'clustering loop only (device-side state '
                        'init, 8-byte materialization) — excludes '
                        'the tunnel-inflated 8 MB result delivery '
                        'the fp32 headline honestly includes'}]
        except Exception as err:   # optional metric must never kill
            _stage('loop-rate metric failed (%s); skipping' % err)
            loop_extra = []

    # --- MSM tail of the north-star: lag-10 counts -> transpose
    # builder -> top-21 reversible eigensolve (warm timings; compile
    # is amortized by the persistent cache)
    from enspara_tpu.msm import builders
    from enspara_tpu.msm.eigen_device import (
        eigenspectrum_reversible, transpose_timescales_device)
    from enspara_tpu.msm.transition_matrices import \
        assigns_to_counts_device

    assigns = np.asarray(res.assignments).reshape(100, -1)
    mask = np.ones_like(assigns, dtype=bool)
    counts_warm = assigns_to_counts_device(assigns, mask, LAG,
                                           N_CLUSTERS)   # warm
    transpose_timescales_device(counts_warm, n_eigs=21,
                                lag_time=LAG)             # warm
    counts_box = []

    def run_counts():
        c = assigns_to_counts_device(assigns, mask, LAG, N_CLUSTERS)
        np.asarray(c.sum())   # materialize, 8-byte fetch
        counts_box.append(c)

    counts_times, counts_retries = _timed_section(run_counts, 'counts')
    counts_s = min(counts_times)
    counts_dev = counts_box[-1]

    # counts never leave HBM: builder + pi-symmetrized top-21 eigh run
    # as ONE device program; only the 21 modes cross the link. Any
    # failure on this path degrades to the host-round-trip engine
    # instead of killing the benchmark.
    eig_retries = 0
    try:
        vals_box = []

        def run_eig():
            _, v, _ = transpose_timescales_device(
                counts_dev, n_eigs=21, lag_time=LAG)
            vals_box.append(v)

        eig_times, eig_retries = _timed_section(run_eig, 'eigsolve')
        eigsolve_s = min(eig_times)
        vals = vals_box[-1]
        assert vals.shape == (21,)

        # integrity: the fused device tail must agree with the host
        # builder + symmetrized solver (outside the timed region)
        counts_host = np.asarray(counts_dev)
        _, T, pi = builders.transpose(counts_host.astype(np.float64))
        ref_vals, _ = eigenspectrum_reversible(T, pi=pi, n_eigs=21,
                                               method='eigh')
        assert np.abs(ref_vals - vals).max() < 1e-4, \
            'device tail diverged from host engine'
    except Exception as err:
        _stage('fused tail failed (%s); host-engine fallback' % err)
        counts_host = np.asarray(counts_dev)
        # in this degraded path the builder runs on the host, so its
        # cost belongs inside the timed region to keep the metric
        # end-to-end honest
        vals_box = []

        def run_eig_host():
            _, T, pi = builders.transpose(counts_host.astype(np.float64))
            v, _ = eigenspectrum_reversible(T, pi=pi, n_eigs=21,
                                            method='eigh')
            vals_box.append(v)

        eig_times, eig_retries = _timed_section(run_eig_host,
                                                'eigsolve-host')
        eigsolve_s = min(eig_times)
        assert vals_box[-1].shape == (21,)

    northstar_s = best + counts_s + eigsolve_s

    # run-to-run spread over the repeated sections (after any retries)
    spread = max(
        max(ts) / min(ts)
        for ts in (cluster_times, counts_times, eig_times) if ts)
    contended = spread > 1.5
    total_retries = cluster_retries + counts_retries + eig_retries

    extra_metrics = [
        {'metric': 'kcenters_frames_per_sec',
         'value': round(frames_per_sec, 1),
         'unit': 'frames/s',
         'vs_baseline': round(
             frames_per_sec
             / (REFERENCE_PAIRS_PER_SEC / N_CLUSTERS), 3)},
        {'metric': 'eigsolve_top20_timescales_s',
         'value': round(eigsolve_s, 4),
         'unit': 's',
         'vs_baseline': round(REFERENCE_EIGSOLVE_S / eigsolve_s, 3)},
        {'metric': 'northstar_1m_to_top20_s',
         'value': round(northstar_s, 3),
         'unit': 's',
         'vs_baseline': round(NORTHSTAR_BUDGET_S / northstar_s, 3)},
    ] + bf16_extra + loop_extra

    # joint-counts family (CARDS/exposons flagship): promoted from the
    # committed on-chip record (benchmarks/reference-configs-result
    # .json config3) with a MEASURED reference denominator when the
    # libinfo probe artifact exists. Not re-measured here — the bench
    # stays the north-star pipeline; the record and its denominator
    # are both committed artifacts.
    ji_path = os.path.join(_HERE, 'benchmarks',
                           'reference-cpu-libinfo-result.json')
    cfg_path = os.path.join(_HERE, 'benchmarks',
                            'reference-configs-result.json')
    joint_note = None
    try:
        with open(ji_path) as f:
            ji = json.load(f)
        with open(cfg_path) as f:
            cfg = json.load(f)
        c3 = cfg['config3']
        # prefer the steady-state number (labels resident in HBM —
        # featurization runs on device in this stack); the end-to-end
        # config3 figure includes this box's dev-tunnel label ingest
        ours_s = c3.get('joint_counts_4x_device_resident_s',
                        c3['cards_4xMI_s'])
        ref_s = ji['reference_total_s']
        extra_metrics.append(
            {'metric': 'cards_joint_counts_4xmi_s',
             'value': round(ours_s, 3),
             'unit': 's',
             'vs_baseline': round(ref_s / ours_s, 3)})
        joint_note = (
            'cards_joint_counts_4xmi_s: ours from committed on-chip '
            'config3 record (%s, device-resident labels; the '
            'end-to-end pipeline incl. tunnel label ingest is %s s); '
            'denominator %.1f s MEASURED from the reference libinfo '
            'joint-histogram path on this host, assuming perfect '
            '16-way prange scaling (%s)'
            % (cfg_path, c3.get('cards_4xMI_s'), ref_s, ji_path))
    except (OSError, KeyError, ValueError):
        pass

    detail = {
        'metric': 'kcenters_qcp_rmsd_pairs_per_sec',
        'value': round(pairs_per_sec, 1),
        'unit': 'pairs/s',
        'vs_baseline': round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 3),
        'extra_metrics': extra_metrics,
        'timing_policy': ('min-of-3 per section; contended batches '
                          '(spread > 1.5x) re-run up to 2 times, '
                          'smallest-spread batch wins'),
        'run_spread_max_over_min': round(spread, 3),
        'retries_used': total_retries,
        'section_times_s': {
            'cluster': [round(t, 4) for t in cluster_times],
            'counts': [round(t, 4) for t in counts_times],
            'eigsolve': [round(t, 4) for t in eig_times],
        },
        'baseline_denominators': {
            'kcenters_qcp_rmsd_pairs_per_sec':
                '%.1e pairs/s ESTIMATED single-node reference: '
                'mdtraj threaded C QCP at ~1.5e6 pairs/s/core x 16 '
                'cores (the reference publishes no numbers, '
                'BASELINE.md)' % REFERENCE_PAIRS_PER_SEC,
            'eigsolve_top20_timescales_s':
                '%.3f s MEASURED reference CPU per-lag cost '
                '(benchmarks/reference-cpu-config2-result.json: '
                '3.48 s / 10 lags)' % REFERENCE_EIGSOLVE_S,
            'northstar_1m_to_top20_s':
                '%.0f s BASELINE north-star budget (<60 s on a '
                'v5p-8); this is a target, not a reference '
                'measurement' % NORTHSTAR_BUDGET_S,
        },
    }
    if joint_note:
        detail['baseline_denominators']['cards_joint_counts_4xmi_s'] \
            = joint_note
    if contended:
        detail['contention_warning'] = (
            'run-to-run spread %.2fx exceeds 1.5x even after %d '
            'retries — tunnel/host contention signature; treat the '
            'min as a lower bound on contention-free performance and '
            'prefer the best committed on-chip record'
            % (spread, total_retries))
    detail['provenance'] = {
        'backend': jax.default_backend(),
        'devices': [str(d) for d in jax.devices()],
        'n_devices': jax.device_count(),
        'jax_version': jax.__version__,
        'timestamp': time.strftime('%Y-%m-%dT%H:%M:%S%z'),
        'n_frames': N_FRAMES,
        'n_clusters': N_CLUSTERS,
    }
    if degraded:
        detail['degraded'] = ('device tunnel unavailable after 3 '
                              'probes with backoff; measured on the '
                              'CPU backend')
        # the dev-box tunnel has multi-hour outages (STATUS.md): point
        # at the most recent committed ON-CHIP record so a degraded
        # run never erases the chip evidence for the round
        rec = os.path.join(_HERE, 'benchmarks', 'bench-v5e-result.json')
        if os.path.exists(rec):
            with open(rec) as f:
                detail['latest_onchip_record'] = json.load(f)
    else:
        # healthy chip run: persist as the round's on-chip record —
        # but never clobber a strictly better prior record with a
        # contended/slower one (round-3 postmortem: a 12.9 s contended
        # run overwrote the same-day 2.6 s record)
        rec = os.path.join(_HERE, 'benchmarks', 'bench-v5e-result.json')
        if jax.default_backend() == 'tpu':
            def _northstar_of(record):
                for m in record.get('extra_metrics', []):
                    if m.get('metric') == 'northstar_1m_to_top20_s':
                        return m['value']
                return np.inf
            prior = None
            if os.path.exists(rec):
                try:
                    with open(rec) as f:
                        prior = json.load(f)
                except (OSError, ValueError):
                    prior = None
            if prior is not None and (_northstar_of(prior)
                                      < _northstar_of(detail)):
                detail['best_onchip_record'] = prior
            else:
                try:
                    with open(rec, 'w') as f:
                        json.dump(detail, f, indent=1)
                except OSError:
                    pass

    # full record to disk; compact line (the driver's 2 KB tail
    # capture) to stdout — see the module docstring's output contract
    detail_blob = json.dumps(detail, indent=1, sort_keys=True)
    detail_path = os.path.join(_HERE, 'benchmarks',
                               'bench-latest-result.json')
    try:
        with open(detail_path, 'w') as f:
            f.write(detail_blob)
    except OSError:
        detail_path = None

    compact = {
        'metric': detail['metric'],
        'value': detail['value'],
        'unit': detail['unit'],
        'vs_baseline': detail['vs_baseline'],
        'extra_metrics': [
            {'metric': m['metric'], 'value': m['value'],
             'unit': m['unit'], 'vs_baseline': m['vs_baseline']}
            for m in extra_metrics],
        'run_spread_max_over_min': round(spread, 3),
        'retries_used': total_retries,
        'backend': jax.default_backend(),
    }
    if contended:
        compact['contended'] = True
    if degraded:
        compact['degraded'] = True
    if detail_path:
        compact['detail'] = 'benchmarks/bench-latest-result.json'
        compact['detail_sha256'] = hashlib.sha256(
            detail_blob.encode()).hexdigest()[:16]
    line = json.dumps(compact)
    assert len(line) < 1900, 'compact line too long: %d' % len(line)
    print(line)


if __name__ == '__main__':
    main()
