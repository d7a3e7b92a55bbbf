"""Property tests for the interleaved rANS core and the v2 container."""

import numpy as np
import pytest

from mtscomp_tpu.models import rans
from mtscomp_tpu.codec.ans import AnsCodec, split_planes, join_planes


@pytest.mark.parametrize('seed', range(5))
@pytest.mark.parametrize('K', [1, 2, 7, 64, 256])
def test_rans_roundtrip(seed, K):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 8000))
    conc = float(rng.choice([0.02, 0.1, 1.0, 10.0]))
    p = rng.dirichlet(np.full(256, conc))
    syms = rng.choice(256, size=n, p=p).astype(np.uint8)
    freqs = rans.quantize_freqs(np.bincount(syms, minlength=256))
    if freqs is None:
        pytest.skip('degenerate single-symbol input')
    states, words = rans.rans_encode_interleaved(syms, freqs, K)
    dec, used = rans.rans_decode_interleaved(states, words, freqs, n, K)
    assert used == words.size
    assert np.array_equal(dec, syms)


def test_rans_near_optimal():
    # Payload within a few % of the Shannon bound for a skewed source.
    rng = np.random.default_rng(0)
    p = np.exp(-0.08 * np.arange(256))
    p /= p.sum()
    n = 200_000
    syms = rng.choice(256, size=n, p=p).astype(np.uint8)
    counts = np.bincount(syms, minlength=256)
    freqs = rans.quantize_freqs(counts)
    states, words = rans.rans_encode_interleaved(syms, freqs, 512)
    nz = counts > 0
    shannon_bits = float(np.sum(counts[nz] * -np.log2(counts[nz] / n)))
    got_bits = 16.0 * words.size
    assert got_bits < shannon_bits * 1.03 + 512 * 32


def test_quantize_freqs_properties():
    rng = np.random.default_rng(1)
    for _ in range(50):
        counts = rng.integers(0, 1000, size=256)
        counts[rng.integers(0, 256, size=100)] = 0
        if (counts > 0).sum() <= 1:
            continue
        freqs = rans.quantize_freqs(counts)
        assert freqs.sum() == rans.SCALE
        assert np.all(freqs[counts > 0] >= 1)
        assert np.all(freqs[counts == 0] == 0)
        assert freqs.max() <= rans.MAX_FREQ


def test_quantize_single_symbol():
    counts = np.zeros(256, dtype=np.int64)
    counts[42] = 1000
    assert rans.quantize_freqs(counts) is None


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
    # Small magnitudes map to small codes (what makes the planes skewed).
    v = np.array([0, -1, 1, -2, 2], dtype=np.int16)
    z = rans.zigzag_encode(v)
    assert list(z) == [0, 1, 2, 3, 4]


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


@pytest.mark.parametrize('shape', [(1, 1), (3, 2), (100, 19), (1234, 7)])
@pytest.mark.parametrize('order', ['C', 'F'])
def test_container_roundtrip(shape, order):
    rng = np.random.default_rng(4)
    chunkd = rng.integers(-30, 30, size=shape).astype(np.int16)
    codec = AnsCodec(ans_lanes=128)
    payload = codec.encode(chunkd, order=order)
    back = codec.decode(payload, shape[0], shape[1], np.int16, order=order)
    assert np.array_equal(back, chunkd)


def test_container_modes():
    codec = AnsCodec(ans_lanes=64)
    # CONST plane: all-zero high bytes.
    chunkd = np.zeros((500, 4), dtype=np.int16)
    payload = codec.encode(chunkd, order='F')
    assert len(payload) < 100   # header + 2 const planes
    parsed = codec.parse(payload)
    assert all(p['mode'] == 2 for p in parsed['planes'])
    # RAW plane: incompressible bytes.
    rng = np.random.default_rng(5)
    chunkd = rng.integers(-2 ** 15, 2 ** 15, size=(500, 4)).astype(np.int16)
    payload = codec.encode(chunkd, order='F')
    parsed = codec.parse(payload)
    assert any(p['mode'] == 0 for p in parsed['planes'])
    back = codec.decode(payload, 500, 4, np.int16, order='F')
    assert np.array_equal(back, chunkd)


def test_container_corruption_detected():
    codec = AnsCodec(ans_lanes=64)
    chunkd = np.random.default_rng(6).integers(
        -30, 30, size=(400, 4)).astype(np.int16)
    payload = bytearray(codec.encode(chunkd, order='F'))
    payload[0] ^= 0xFF  # break magic
    with pytest.raises(IOError):
        codec.decode(bytes(payload), 400, 4, np.int16, order='F')
    with pytest.raises(IOError):
        codec.decode(b'', 400, 4, np.int16, order='F')
