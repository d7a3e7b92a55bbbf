"""Property tests for the grouped rANS core and the v2 container."""

import numpy as np
import pytest

from mtscomp_tpu.models import rans
from mtscomp_tpu.codec.ans import (AnsCodec, split_planes, join_planes,
                                   MODE_RAW, MODE_RANS, MODE_CONST)


def _random_table(rng, conc=1.0):
    p = rng.dirichlet(np.full(256, conc))
    return p


@pytest.mark.parametrize('seed', range(8))
def test_rans_group_roundtrip(seed):
    rng = np.random.default_rng(seed)
    R = int(rng.integers(1, rans.GROUP_ROWS + 1))
    rows, tables = [], []
    for _ in range(R):
        n = int(rng.integers(0, 6000))
        p = _random_table(rng, float(rng.choice([0.02, 0.1, 1.0, 10.0])))
        syms = rng.choice(256, size=n, p=p).astype(np.uint8)
        counts = np.bincount(syms, minlength=256)
        freqs = (rans.quantize_freqs(counts)
                 if n and (counts > 0).sum() >= 2 else None)
        if freqs is None:
            freqs = rans.quantize_freqs(
                np.array([1, 1] + [0] * 254, dtype=np.int64))
        rows.append(syms)
        tables.append(freqs)
    states, words = rans.rans_encode_group(rows, np.stack(tables))
    dec, used = rans.rans_decode_group(states, words, np.stack(tables),
                                       [len(r) for r in rows])
    assert used == words.size
    for a, b in zip(dec, rows):
        assert np.array_equal(a, b)


def test_rans_near_optimal():
    # Payload within a few % of the Shannon bound for a skewed source.
    rng = np.random.default_rng(0)
    p = np.exp(-0.08 * np.arange(256))
    p /= p.sum()
    n = 100_000
    syms = rng.choice(256, size=n, p=p).astype(np.uint8)
    counts = np.bincount(syms, minlength=256)
    freqs = rans.quantize_freqs(counts)
    states, words = rans.rans_encode_group([syms], freqs[None])
    nz = counts > 0
    # Payload must sit within 2% of the cross-entropy under the quantized
    # model (the coder itself is near-lossless; quantization + min_freq
    # account for the model gap vs Shannon).
    model_bits = float(np.sum(
        counts[nz] * (rans.SCALE_BITS - np.log2(freqs[nz].astype(float)))))
    shannon_bits = float(np.sum(counts[nz] * -np.log2(counts[nz] / n)))
    assert model_bits < shannon_bits * 1.15
    assert 16.0 * words.size < model_bits * 1.02 + 128 * 32


def test_native_decoder_matches_normative():
    """C++ batch decoder output and word counts match the NumPy coder."""
    from mtscomp_tpu import native
    if not native.available():  # pragma: no cover
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(3)
    enc_groups, truth = [], []
    for gi in range(4):
        R = int(rng.integers(1, rans.GROUP_ROWS + 1))
        rows, tables = [], []
        for r in range(R):
            n = int(rng.integers(1, 3000))
            p = rng.dirichlet(np.full(256, float(rng.choice([0.05, 1.0]))))
            syms = rng.choice(256, size=n, p=p).astype(np.uint8)
            counts = np.bincount(syms, minlength=256)
            f = rans.quantize_freqs(counts)
            if f is None:
                counts[(int(syms[0]) + 1) % 256] += 1
                f = rans.quantize_freqs(counts)
            rows.append(syms)
            tables.append(f)
        st, wd = rans.rans_encode_group(rows, np.stack(tables))
        truth.append(rows)
        outs = [np.empty(len(r), np.uint8) for r in rows]
        enc_groups.append((st, wd, np.stack(tables), outs))
    used = native.rans_decode_groups(enc_groups, n_threads=2)
    assert used is not None
    for (st, wd, _, outs), rows, u in zip(enc_groups, truth, used):
        assert u == wd.size
        for out, row in zip(outs, rows):
            assert np.array_equal(out, row)


def test_native_decoder_rejects_corrupt():
    """Truncated word streams surface as a native error (None)."""
    from mtscomp_tpu import native
    if not native.available():  # pragma: no cover
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(4)
    syms = rng.integers(0, 256, size=4000).astype(np.uint8)
    f = rans.quantize_freqs(np.bincount(syms, minlength=256))
    st, wd = rans.rans_encode_group([syms], f[None])
    out = [np.empty(syms.size, np.uint8)]
    assert native.rans_decode_groups(
        [(st, wd[:wd.size // 2], f[None], out)]) is None


def test_encoder_reciprocals_exact():
    """q = mulhi32(x, rcp) >> shift equals x // f over the encoder range.

    Every divisor the format can produce (f in [2, SCALE-MIN_FREQ]),
    probed at the quotient boundaries k*f-1 / k*f (where reciprocal
    schemes fail if they fail) plus random points, over the encoder's
    post-renorm range x < f << 20.
    """
    rng = np.random.default_rng(0)
    freqs = np.zeros((1, 256), dtype=np.int64)
    all_f = np.arange(2, rans.SCALE - rans.MIN_FREQ + 1, dtype=np.uint64)
    for f0 in range(0, all_f.size, 256):
        fs = all_f[f0:f0 + 256]
        freqs = np.zeros(256, dtype=np.int64)
        freqs[:fs.size] = fs
        pk, rcp = rans.encoder_tables(freqs)
        shift = (pk >> 25).astype(np.uint64)
        for i, f in enumerate(fs):
            hi = 1 << 32                  # exact over ALL 32-bit x
            ks = rng.integers(1, hi // int(f) + 1, size=32, dtype=np.uint64)
            xs = np.unique(np.concatenate([
                ks * f, ks * f - 1,
                rng.integers(0, hi, size=32, dtype=np.uint64),
                np.array([0, 1, int(f) - 1, int(f), hi - 1,
                          (int(f) << 20) - 1], dtype=np.uint64)]))
            xs = xs[xs < hi]
            t = (xs * np.uint64(rcp[i])) >> np.uint64(32)
            q = (((xs - t) >> np.uint64(1)) + t) >> shift[i]
            assert np.array_equal(q, xs // f), int(f)


def test_quantize_freqs_properties():
    rng = np.random.default_rng(1)
    for _ in range(50):
        counts = rng.integers(0, 1000, size=256)
        counts[rng.integers(0, 256, size=100)] = 0
        if (counts > 0).sum() <= 1:
            continue
        freqs = rans.quantize_freqs(counts)
        assert freqs.sum() == rans.SCALE
        assert np.all(freqs[counts > 0] >= rans.MIN_FREQ)
        assert np.all(freqs[counts == 0] == 0)


def test_quantize_single_symbol():
    counts = np.zeros(256, dtype=np.int64)
    counts[42] = 1000
    assert rans.quantize_freqs(counts) is None


def test_coarse_table_single_fixups():
    """coarse + <=2 compare-increments covers every slot (dense ids)."""
    rng = np.random.default_rng(2)
    for _ in range(100):
        counts = rng.integers(0, 1000, size=256)
        counts[rng.integers(0, 256, size=rng.integers(0, 250))] = 0
        if (counts > 0).sum() < 2:
            continue
        freqs = rans.quantize_freqs(counts)
        # Dense alphabet remap.
        present = np.flatnonzero(freqs)
        dense_f = freqs[present].astype(np.int64)
        dense_upper = np.cumsum(dense_f)
        full = rans.slot_to_symbol_table(freqs)
        # coarse over dense ids
        dense_of_byte = np.zeros(256, np.int64)
        dense_of_byte[present] = np.arange(present.size)
        coarse = dense_of_byte[rans.coarse_table(freqs).astype(np.int64)]
        slots = np.arange(4096)
        did = coarse[slots >> 4]
        did = did + (slots >= dense_upper[did])
        did = did + (slots >= dense_upper[did])
        assert np.array_equal(present[did], full.astype(np.int64))


@pytest.mark.parametrize('dt', ['int8', 'uint8', 'int16', 'uint16',
                                'int32', 'uint32'])
def test_zigzag(dt):
    info = np.iinfo(dt)
    rng = np.random.default_rng(2)
    v = rng.integers(info.min, info.max, size=2000, endpoint=True, dtype=dt)
    v = np.concatenate([v, [info.min, info.max, 0, 1]
                        if info.min < 0 else [0, info.max, 1, 2]]).astype(dt)
    z = rans.zigzag_encode(v)
    assert z.dtype.kind == 'u'
    back = rans.zigzag_decode(z, np.dtype(dt))
    assert np.array_equal(back, v)


def test_zigzag_small_codes():
    v = np.array([0, -1, 1, -2, 2], dtype=np.int16)
    assert list(rans.zigzag_encode(v)) == [0, 1, 2, 3, 4]


@pytest.mark.parametrize('dt', ['int16', 'float32', 'uint8', 'int32'])
def test_plane_split_join(dt):
    rng = np.random.default_rng(3)
    if np.dtype(dt).kind == 'f':
        v = rng.normal(size=1000).astype(dt)
        zig = False
    else:
        info = np.iinfo(dt)
        v = rng.integers(info.min, info.max, size=1000, dtype=dt)
        zig = True
    planes = split_planes(v, zig)
    assert planes.shape == (1000, np.dtype(dt).itemsize)
    back = join_planes(planes, np.dtype(dt), zig)
    assert np.array_equal(back, v)


@pytest.mark.parametrize('shape', [(1, 1), (3, 2), (100, 19), (1234, 7),
                                   (4096, 13)])
@pytest.mark.parametrize('order', ['C', 'F'])
def test_container_roundtrip(shape, order):
    rng = np.random.default_rng(4)
    chunkd = rng.integers(-30, 30, size=shape).astype(np.int16)
    codec = AnsCodec()
    payload = codec.encode(chunkd, order=order)
    back = codec.decode(payload, shape[0], shape[1], np.int16, order=order)
    assert np.array_equal(back, chunkd)


@pytest.mark.parametrize('seg_log2', [7, 10, 12, 17])
def test_container_segment_sizes(seg_log2):
    """Multiple segments and partially-filled groups all round-trip."""
    rng = np.random.default_rng(5)
    chunkd = rng.integers(-40, 40, size=(5000, 9)).astype(np.int16)
    codec = AnsCodec(seg_log2=seg_log2, channel_aligned=False)
    payload = codec.encode(chunkd, order='F')
    parsed = AnsCodec().parse(payload)
    assert parsed['seg_log2'] == seg_log2
    assert not parsed['aligned']
    back = AnsCodec().decode(payload, 5000, 9, np.int16, order='F')
    assert np.array_equal(back, chunkd)


@pytest.mark.parametrize('shape', [(5000, 9), (129, 3), (30000, 385),
                                   (257, 128)])
def test_container_channel_aligned(shape):
    """Channel-aligned segments (flag bit2) round-trip byte-exactly."""
    rng = np.random.default_rng(9)
    chunkd = rng.integers(-40, 40, size=shape).astype(np.int16)
    codec = AnsCodec(channel_aligned=True)
    payload = codec.encode(chunkd, order='F')
    parsed = codec.parse(payload)
    assert parsed['aligned']
    C, tcs = shape[1], shape[0] - 1
    tp = -(-tcs // 128) * 128
    assert parsed['tp'] == tp and parsed['tcs'] == tcs
    assert parsed['n_stream'] == C * tp
    back = codec.decode(payload, shape[0], shape[1], np.int16, order='F')
    assert np.array_equal(back, chunkd)
    # Aligned and plain containers must stay mutually decodable.
    plain = AnsCodec(channel_aligned=False).encode(chunkd, order='F')
    back2 = codec.decode(plain, shape[0], shape[1], np.int16, order='F')
    assert np.array_equal(back2, chunkd)


def test_container_modes():
    codec = AnsCodec(seg_log2=10)
    # CONST plane: all-zero high bytes.
    chunkd = np.zeros((500, 4), dtype=np.int16)
    payload = codec.encode(chunkd, order='F')
    assert len(payload) < 100
    parsed = codec.parse(payload)
    assert all(p['mode'] == MODE_CONST for p in parsed['planes'])
    # RAW plane: incompressible bytes.
    rng = np.random.default_rng(5)
    chunkd = rng.integers(-2 ** 15, 2 ** 15, size=(500, 4)).astype(np.int16)
    payload = codec.encode(chunkd, order='F')
    parsed = codec.parse(payload)
    assert any(p['mode'] == MODE_RAW for p in parsed['planes'])
    back = codec.decode(payload, 500, 4, np.int16, order='F')
    assert np.array_equal(back, chunkd)


def test_container_mixed_planes_grouped():
    """lo plane RANS + hi plane CONST: groups only cover RANS planes."""
    rng = np.random.default_rng(6)
    chunkd = rng.integers(-50, 50, size=(20000, 5)).astype(np.int16)
    codec = AnsCodec(seg_log2=12)
    payload = codec.encode(chunkd, order='F')
    parsed = codec.parse(payload)
    assert parsed['modes'][0] == MODE_RANS
    assert parsed['modes'][1] == MODE_CONST
    n_segs = -(-100000 // 4096)
    assert len(parsed['groups']) == -(-n_segs // rans.GROUP_ROWS)
    back = codec.decode(payload, 20000, 5, np.int16, order='F')
    assert np.array_equal(back, chunkd)


def test_container_corruption_detected():
    codec = AnsCodec(seg_log2=10)
    chunkd = np.random.default_rng(6).integers(
        -30, 30, size=(400, 4)).astype(np.int16)
    payload = bytearray(codec.encode(chunkd, order='F'))
    payload[0] ^= 0xFF  # break magic
    with pytest.raises(IOError):
        codec.decode(bytes(payload), 400, 4, np.int16, order='F')
    with pytest.raises(IOError):
        codec.decode(b'', 400, 4, np.int16, order='F')


def _fuzz_case(table_mode):
    """(codec, chunkd, shape) for the fuzz payloads: plain planes, or a
    container exercising the bit4 multi-table layout (clustered tables
    on plane 0 AND a single-table-under-bit4 plane 1)."""
    rng = np.random.default_rng(7)
    if table_mode == 'segment':
        codec = AnsCodec(seg_log2=10, table_mode='segment')
        stds = np.logspace(0, 1.6, 16)
        chunkd = (rng.normal(0, 1, size=(3000, 16)) * stds
                  ).astype(np.int16)
        assert 'tidx' in codec.parse(
            codec.encode(chunkd, order='F'))['planes'][0]
    else:
        codec = AnsCodec(seg_log2=10)
        chunkd = rng.integers(-30, 30, size=(800, 6)).astype(np.int16)
    return codec, chunkd


@pytest.mark.parametrize('table_mode', ['plane', 'segment'])
def test_container_fuzz_all_detected(table_mode):
    """Every random mutation of a valid container raises IOError: byte
    flips and appended garbage break the trailing CRC32, truncation
    breaks the length/CRC checks, garbage breaks the magic — corruption
    is DETECTED, not just survived (the rANS stream itself has no
    redundancy, so before the checksum a flipped word could decode to
    plausible garbage silently)."""
    rng = np.random.default_rng(7)
    codec, chunkd = _fuzz_case(table_mode)
    ns, nc = chunkd.shape
    good = codec.encode(chunkd, order='F')
    for trial in range(200):
        payload = bytearray(good)
        mode = trial % 4
        if mode == 0:      # flip random bytes
            for _ in range(int(rng.integers(1, 8))):
                payload[int(rng.integers(0, len(payload)))] ^= \
                    int(rng.integers(1, 256))
        elif mode == 1:    # truncate
            payload = payload[:int(rng.integers(0, len(payload)))]
        elif mode == 2:    # append garbage
            payload += bytes(rng.integers(0, 256, size=7, dtype=np.uint8))
        else:              # pure garbage of plausible size
            payload = bytearray(
                rng.integers(0, 256, size=int(rng.integers(1, 400)),
                             dtype=np.uint8))
        with pytest.raises(IOError):
            codec.decode(bytes(payload), ns, nc, np.int16, order='F')


def _strip_crc(payload):
    """Remove the trailing CRC32 and clear flag bit3 (a pre-checksum
    container, as written before the bit existed)."""
    from mtscomp_tpu.codec.ans import FLAG_CRC32
    data = bytearray(payload[:-4])
    # Header '<IBBBBI...': flags is the byte at offset 6.
    assert data[6] & FLAG_CRC32
    data[6] ^= FLAG_CRC32
    return bytes(data)


@pytest.mark.parametrize('table_mode', ['plane', 'segment'])
def test_container_fuzz_crcless_never_crashes(table_mode):
    """Mutations of a CRC-less (legacy) container reach the actual
    decoders — native C++ and normative NumPy — and must either
    round-trip to the right shape or raise IOError; never crash, hang,
    or index out of bounds (the pre-checksum detection contract)."""
    rng = np.random.default_rng(9)
    codec, chunkd = _fuzz_case(table_mode)
    ns, nc = chunkd.shape
    good = _strip_crc(codec.encode(chunkd, order='F'))
    back = codec.decode(good, ns, nc, np.int16, order='F')
    assert np.array_equal(back, chunkd)          # CRC-less still decodes
    for trial in range(200):
        payload = bytearray(good)
        mode = trial % 4
        if mode == 0:      # flip random bytes
            for _ in range(int(rng.integers(1, 8))):
                payload[int(rng.integers(0, len(payload)))] ^= \
                    int(rng.integers(1, 256))
        elif mode == 1:    # truncate
            payload = payload[:int(rng.integers(0, len(payload)))]
        elif mode == 2:    # append garbage
            payload += bytes(rng.integers(0, 256, size=7, dtype=np.uint8))
        else:              # pure garbage of plausible size
            payload = bytearray(
                rng.integers(0, 256, size=int(rng.integers(1, 400)),
                             dtype=np.uint8))
        try:
            out = codec.decode(bytes(payload), ns, nc, np.int16,
                               order='F')
            assert out.shape == (ns, nc)
        except IOError:
            pass


def test_word_underrun_raises_ioerror():
    """The normative decoder reports stream exhaustion as IOError (not a
    shape error) when handed fewer words than the group consumes."""
    rng = np.random.default_rng(8)
    n = 4096
    syms = rng.integers(0, 64, size=4 * n, dtype=np.uint8).reshape(4, n)
    f = rans.quantize_freqs(np.bincount(syms.reshape(-1), minlength=256))
    rows = list(syms)
    st, wd = rans.rans_encode_group(rows, np.tile(f, (4, 1)))
    assert wd.size > 4
    with pytest.raises(IOError):
        rans.rans_decode_group(st, wd[:wd.size // 2], np.tile(f, (4, 1)),
                               [n] * 4)


def test_device_decode_detects_corrupt_words(tmp_path_):
    """A word-value flip that survives structural parsing is caught by
    the device pipeline (CRC at parse; the word-consumption audit backs
    it up for files written without a CRC)."""
    from mtscomp_tpu import compress, decompress
    from mtscomp_tpu.parallel.pipeline import decompress_to_array
    from conftest import write_arr, to_int16, make_signal
    arr = to_int16(make_signal('colored', ns=3 * 2000, nc=8))
    path = write_arr(tmp_path_ / 'c.bin', arr)
    compress(path, tmp_path_ / 'c.cbin', tmp_path_ / 'c.ch',
             sample_rate=2000.0, n_channels=8, dtype='int16',
             algorithm='ans', quiet=True, ans_seg_log2=12)
    data = bytearray((tmp_path_ / 'c.cbin').read_bytes())
    data[len(data) // 2] ^= 0xFF
    (tmp_path_ / 'c.cbin').write_bytes(bytes(data))
    r = decompress(tmp_path_ / 'c.cbin', tmp_path_ / 'c.ch', quiet=True)
    try:
        with pytest.raises(IOError):
            decompress_to_array(r)
        with pytest.raises(IOError):
            r[:]
    finally:
        r.close()
