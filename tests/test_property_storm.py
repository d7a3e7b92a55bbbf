"""Randomized round-trip storm: the codec must be exact for ANY
geometry x dtype x signal-shape x parameter combination.

Fixed-shape tests pin known cases; this sweep drives the whole
encode/decode stack (host codec incl. the native fast paths, plus the
generic fallbacks) through random corners: single-channel chunks,
chunks shorter than a lane, single-segment planes, constant planes,
saturated data, every integer width, both orders, both table modes.
Seeds are fixed — failures reproduce.
"""

import numpy as np
import pytest

from mtscomp_tpu.codec.ans import AnsCodec
from mtscomp_tpu.codec.zlib_codec import ZlibCodec

DTYPES = ['uint8', 'int8', 'int16', 'uint16', 'int32', 'uint32',
          'int64', 'uint64']


def _random_chunk(rng):
    ns = int(rng.integers(2, 700))
    nc = int(rng.integers(1, 50))
    dtype = np.dtype(str(rng.choice(DTYPES)))
    kind = int(rng.integers(0, 5))
    if kind == 0:                       # all-constant
        arr = np.full((ns, nc), int(rng.integers(-3, 4)))
    elif kind == 1:                     # tiny alphabet
        arr = rng.integers(-2, 3, size=(ns, nc))
    elif kind == 2:                     # full-range noise (RAW planes)
        info = np.iinfo(dtype)
        return rng.integers(info.min, info.max, size=(ns, nc),
                            endpoint=True, dtype=dtype)
    elif kind == 3:                     # heterogeneous channels
        stds = np.exp(rng.uniform(0, 4, nc))
        arr = rng.normal(0, 1, size=(ns, nc)) * stds
    else:                               # smooth walks
        arr = np.cumsum(rng.normal(0, 10, size=(ns, nc)), axis=0)
    # Round-trip through int64 first: float -> unsigned casts of
    # negative values are undefined; int64 -> uintN wraps mod 2^N
    # deterministically.
    return np.asarray(arr).astype(np.int64).astype(dtype)


@pytest.mark.parametrize('seed', range(4))
def test_ans_roundtrip_storm(seed):
    rng = np.random.default_rng(1000 + seed)
    for trial in range(40):
        chunkd = _random_chunk(rng)
        order = str(rng.choice(['F', 'C']))
        codec = AnsCodec(
            seg_log2=int(rng.integers(7, 17)),
            channel_aligned=bool(rng.integers(0, 2)),
            table_mode=str(rng.choice(['plane', 'segment'])))
        payload = codec.encode(chunkd, order=order)
        back = codec.decode(payload, *chunkd.shape, chunkd.dtype,
                            order=order)
        assert np.array_equal(back, chunkd), \
            (seed, trial, chunkd.shape, chunkd.dtype, order,
             codec.seg_log2, codec.channel_aligned, codec.table_mode)
        # Payloads must be self-contained and re-parseable.
        parsed = codec.parse(payload)
        assert parsed['n_elems'] == chunkd.size


@pytest.mark.parametrize('seed', range(2))
def test_ans_storm_numpy_paths_identical(seed, monkeypatch):
    """The same storm with every native fast path disabled must produce
    IDENTICAL payloads and decodes (the normative-path contract)."""
    import mtscomp_tpu.native as native
    rng = np.random.default_rng(2000 + seed)
    cases = []
    for _ in range(8):
        chunkd = _random_chunk(rng)
        codec = AnsCodec(
            seg_log2=int(rng.integers(8, 14)),
            table_mode=str(rng.choice(['plane', 'segment'])))
        cases.append((chunkd, codec, codec.encode(chunkd, order='F')))
    monkeypatch.setattr(native, 'available', lambda: False)
    monkeypatch.setattr(native, 'prepare2_i16', lambda *a, **k: None)
    monkeypatch.setattr(native, 'fuse2_i16', lambda *a, **k: False)
    monkeypatch.setattr(native, 'cumsum_axis0_inplace',
                        lambda *a, **k: False)
    monkeypatch.setattr(native, 'rans_encode_groups',
                        lambda *a, **k: None)
    monkeypatch.setattr(native, 'quantize_freqs_batch',
                        lambda *a, **k: None)
    for chunkd, codec, payload in cases:
        assert codec.encode(chunkd, order='F') == payload
        back = codec.decode(payload, *chunkd.shape, chunkd.dtype)
        assert np.array_equal(back, chunkd)


def test_zlib_roundtrip_storm():
    rng = np.random.default_rng(3000)
    codec = ZlibCodec()
    for _ in range(30):
        chunkd = _random_chunk(rng)
        order = str(rng.choice(['F', 'C']))
        payload = codec.encode(chunkd, order=order)
        back = codec.decode(payload, *chunkd.shape, chunkd.dtype,
                            order=order)
        assert np.array_equal(back, chunkd)
