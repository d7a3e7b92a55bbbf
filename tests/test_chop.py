"""``chop`` semantics: a chopped file must be byte-identical to compressing
the truncated original (reference: tests.py:451-492)."""

import json

import numpy as np

from mtscomp_tpu import compress, decompress

from conftest import SAMPLE_RATE, write_arr, to_int16, make_signal

from test_check import sha1


def test_chop_equivalence(tmp_path_, algorithm):
    arr = to_int16(make_signal('colored', ns=5000, nc=7))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, outmeta = tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=1000.0, n_channels=7,
             dtype=arr.dtype, algorithm=algorithm, quiet=True)

    r = decompress(out, outmeta)
    n_keep = 3
    chopped = tmp_path_ / 'chopped.cbin'
    r.chop(n_keep, chopped)
    bounds = r.chunk_bounds
    r.close()

    # Compressing the truncated raw file must give identical bytes.
    trunc = arr[:bounds[n_keep]]
    tpath = write_arr(tmp_path_ / 'trunc.bin', trunc)
    tout, toutmeta = tmp_path_ / 'trunc.cbin', tmp_path_ / 'trunc.ch'
    compress(tpath, tout, toutmeta, sample_rate=1000.0, n_channels=7,
             dtype=arr.dtype, algorithm=algorithm, quiet=True)
    assert sha1(chopped) == sha1(tout)

    # Chopped sidecar: truncated tables, nulled hashes, chopped flag.
    cmeta = json.loads((tmp_path_ / 'chopped.ch').read_text())
    assert cmeta['chopped'] is True
    assert cmeta['sha1_compressed'] is None
    assert cmeta['sha1_uncompressed'] is None
    assert len(cmeta['chunk_bounds']) == n_keep + 1

    # And it decompresses to the truncated data.
    rc = decompress(chopped, tmp_path_ / 'chopped.ch')
    assert np.array_equal(rc[:], trunc)
    rc.close()


def test_chop_validates_arguments(tmp_path_):
    """User-input validation survives python -O (exceptions, not asserts)."""
    arr = to_int16(make_signal('randn', ns=5000, nc=7))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, outmeta = tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=1000.0, n_channels=7,
             dtype=arr.dtype, quiet=True)
    r = decompress(out, outmeta)
    try:
        import pytest
        with pytest.raises(ValueError, match='positive'):
            r.chop(0, tmp_path_ / 'c.cbin')
        with pytest.raises(ValueError, match='positive'):
            r.chop(-1, tmp_path_ / 'c.cbin')
        with pytest.raises(ValueError, match='output path'):
            r.chop(2, None)
        with pytest.raises(ValueError, match='cbin'):
            r.chop(2, tmp_path_ / 'c.bin')
    finally:
        r.close()


def test_chop_validation_survives_python_O(tmp_path_):
    """The same validation errors fire under ``python -O`` (no asserts)."""
    import subprocess, sys, os
    arr = to_int16(make_signal('randn', ns=5000, nc=7))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, outmeta = tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=1000.0, n_channels=7,
             dtype=arr.dtype, quiet=True)
    code = (
        "from mtscomp_tpu import decompress\n"
        "r = decompress(%r, %r, quiet=True)\n"
        "for args in [(0, 'c.cbin'), (2, None), (2, 'c.bin')]:\n"
        "    try:\n"
        "        r.chop(*args)\n"
        "    except ValueError:\n"
        "        pass\n"
        "    else:\n"
        "        raise SystemExit('chop(%%r) did not raise' %% (args,))\n"
        "r.close()\n" % (str(out), str(outmeta)))
    env = dict(os.environ)
    env['PYTHONPATH'] = env.get('PYTHONPATH', '') + os.pathsep + \
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, '-O', '-c', code],
                          capture_output=True, text=True, env=env,
                          cwd=str(tmp_path_))
    assert proc.returncode == 0, proc.stderr + proc.stdout


def test_chop_preserves_decode_semantic_keys(tmp_path_):
    """A chopped file must inherit every DECODE_IDENTITY key — an
    order-2 or float-bitcast source whose chop dropped the v2 sidecar
    extension would decode wrong with no error (the keys are
    sidecar-only, invisible to the chunk payloads)."""
    rng = np.random.RandomState(5)
    t = np.arange(9000) / 3000.0
    lfp = (np.sin(2 * np.pi * 3. * t)[:, None] * 12000
           + rng.normal(0, 6., (9000, 11))).astype(np.int16)
    path = write_arr(tmp_path_ / 'o2.bin', lfp)
    compress(path, tmp_path_ / 'o2.cbin', tmp_path_ / 'o2.ch',
             sample_rate=3000.0, n_channels=11, dtype='int16',
             algorithm='ans', time_diff_order=2, quiet=True)
    r = decompress(tmp_path_ / 'o2.cbin', tmp_path_ / 'o2.ch', quiet=True)
    assert r.time_diff_order == 2
    r.chop(2, tmp_path_ / 'o2c.cbin')
    r.close()
    rc = decompress(tmp_path_ / 'o2c.cbin', tmp_path_ / 'o2c.ch',
                    quiet=True)
    try:
        assert rc.cmeta['time_diff_order'] == 2
        assert np.array_equal(rc[:], lfp[:rc.shape[0]])
    finally:
        rc.close()

    arr = rng.normal(0, 1, (9000, 11)).astype(np.float32)
    path = write_arr(tmp_path_ / 'fb.bin', arr)
    compress(path, tmp_path_ / 'fb.cbin', tmp_path_ / 'fb.ch',
             sample_rate=3000.0, n_channels=11, dtype='float32',
             algorithm='ans', quiet=True, check_after_compress=False)
    r = decompress(tmp_path_ / 'fb.cbin', tmp_path_ / 'fb.ch', quiet=True)
    r.chop(2, tmp_path_ / 'fbc.cbin')
    r.close()
    rc = decompress(tmp_path_ / 'fbc.cbin', tmp_path_ / 'fbc.ch',
                    quiet=True)
    try:
        assert rc.cmeta['float_bitcast'] is True
        out = np.asarray(rc[:])
        assert np.array_equal(out.view(np.int32),
                              arr[:rc.shape[0]].view(np.int32))
    finally:
        rc.close()
