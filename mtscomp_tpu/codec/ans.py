"""Format-v2 chunk codec: zigzag + byte planes + lane-interleaved rANS.

Replaces the reference's zlib stage (mtscomp.py:394, 619) with a codec
whose decode is data-parallel across K lanes and across chunks — the
shape TPU hardware wants. Each chunk payload is fully self-contained
(same invariant as the zlib chunks), so random access, ``chop`` and the
offset-table format all work unchanged.

Chunk container layout (all little-endian)::

    header:
      u32  magic   = 0x3253544D ("MTS2")
      u8   container version (1)
      u8   n_planes (= dtype itemsize)
      u16  n_lanes K
      u32  n_elems (elements in the chunk)
      u8   flags   (bit0: zigzag applied to elements)
      u8   scale_bits (12)
      u16  reserved
    then, per plane p (plane p = byte p of each element, LSB first):
      u8 mode:
        0 RAW   -> n_elems raw bytes
        1 RANS  -> u16 freq[256] ; u32 n_words ; u32 state[K] ;
                   u16 word[n_words]
        2 CONST -> u8 value

Plane transform: integer elements are zigzag-mapped (wrapped diffs become
small codes) and split into itemsize byte planes; the high planes of
int16 neural data then collapse to near-zero entropy and usually hit
CONST/RANS-with-tiny-payload. Floats skip zigzag and code raw byte
planes.
"""

import struct

import numpy as np

from ..models import rans

MAGIC = 0x3253544D
CONTAINER_VERSION = 1
MODE_RAW, MODE_RANS, MODE_CONST = 0, 1, 2

_HEADER = struct.Struct('<IBBHIBBH')
assert _HEADER.size == 16


def split_planes(elements, zigzag):
    """Element vector -> (n_elems, itemsize) uint8 plane matrix (LSB first)."""
    if zigzag:
        elements = rans.zigzag_encode(elements)
    u = np.ascontiguousarray(elements)
    if u.dtype.byteorder == '>':  # pragma: no cover
        u = u.astype(u.dtype.newbyteorder('<'))
    return u.view(np.uint8).reshape(u.size, u.dtype.itemsize)


def join_planes(planes, dtype, zigzag):
    """Inverse of :func:`split_planes`."""
    dtype = np.dtype(dtype)
    flat = np.ascontiguousarray(planes).view(
        np.dtype('<u%d' % dtype.itemsize) if dtype.itemsize > 1 else np.uint8
    ).reshape(-1)
    if zigzag:
        return rans.zigzag_decode(flat.view('u%d' % dtype.itemsize), dtype)
    return flat.view(dtype)


def _estimated_rans_bytes(counts, freqs, n_lanes):
    """Size estimate used for the RAW-vs-RANS decision (header + tables +
    states + Shannon payload under the quantized model)."""
    nz = counts > 0
    bits = float(np.sum(counts[nz] * (rans.SCALE_BITS - np.log2(freqs[nz]))))
    return 512 + 4 + 4 * n_lanes + bits / 8.0


class AnsCodec:
    """Encode/decode one diffed chunk with interleaved rANS byte planes."""

    name = 'ans'
    format_version = '2.0'

    def __init__(self, ans_lanes=1024, **kwargs):
        self.n_lanes = int(ans_lanes)
        assert self.n_lanes >= 1

    def lanes_for(self, n_elems):
        """Lane count for a chunk: config value, shrunk for tiny chunks."""
        return max(1, min(self.n_lanes, n_elems))

    # --- encode -----------------------------------------------------------

    def encode(self, chunkd, order='F'):
        chunkd = np.asarray(chunkd)
        elements = chunkd.ravel(order=order)
        n_elems = elements.size
        itemsize = elements.dtype.itemsize
        zigzag = elements.dtype.kind in 'iu'
        K = self.lanes_for(n_elems)

        planes = split_planes(elements, zigzag)
        parts = [_HEADER.pack(MAGIC, CONTAINER_VERSION, itemsize, K,
                              n_elems, int(zigzag), rans.SCALE_BITS, 0)]
        for p in range(itemsize):
            parts.append(self._encode_plane(planes[:, p], K))
        return b''.join(parts)

    def _encode_plane(self, plane, K):
        n = plane.size
        counts = np.bincount(plane, minlength=256)
        freqs = rans.quantize_freqs(counts)
        if freqs is None:
            # Single distinct byte value in the whole plane.
            return struct.pack('<BB', MODE_CONST, int(plane[0]))
        if _estimated_rans_bytes(counts, freqs, K) >= n:
            return struct.pack('<B', MODE_RAW) + plane.tobytes()
        states, words = rans.rans_encode_interleaved(plane, freqs, K)
        return b''.join([
            struct.pack('<B', MODE_RANS),
            freqs.astype('<u2').tobytes(),
            struct.pack('<I', words.size),
            states.astype('<u4').tobytes(),
            words.astype('<u2').tobytes(),
        ])

    # --- decode -----------------------------------------------------------

    def decode(self, payload, n_samples, n_channels, dtype, order='F'):
        dtype = np.dtype(dtype)
        parsed = self.parse(payload)
        n_elems = parsed['n_elems']
        if n_elems != n_samples * n_channels:
            raise IOError("ANS chunk has %d elements, expected %d."
                          % (n_elems, n_samples * n_channels))
        if parsed['itemsize'] != dtype.itemsize:
            raise IOError("ANS chunk itemsize %d does not match dtype %s."
                          % (parsed['itemsize'], dtype))
        planes = np.empty((n_elems, parsed['itemsize']), dtype=np.uint8)
        for p, plane in enumerate(parsed['planes']):
            planes[:, p] = self._decode_plane(plane, n_elems)
        flat = join_planes(planes, dtype, parsed['zigzag'])
        return flat.reshape((n_samples, n_channels), order=order)

    def _decode_plane(self, plane, n_elems):
        mode = plane['mode']
        if mode == MODE_CONST:
            return np.full(n_elems, plane['value'], dtype=np.uint8)
        if mode == MODE_RAW:
            return plane['raw']
        out, used = rans.rans_decode_interleaved(
            plane['states'], plane['words'], plane['freqs'],
            n_elems, plane['n_lanes'])
        if used != plane['words'].size:
            raise IOError("ANS plane consumed %d of %d payload words."
                          % (used, plane['words'].size))
        return out

    # --- container parsing (shared with the device decode path) -----------

    def parse(self, payload):
        """Parse a chunk container into numpy views (no entropy decode)."""
        mv = memoryview(payload)
        if len(mv) < _HEADER.size:
            raise IOError("ANS chunk too short (%d bytes)." % len(mv))
        (magic, version, itemsize, K, n_elems, flags, scale_bits, _
         ) = _HEADER.unpack_from(mv, 0)
        if magic != MAGIC:
            raise IOError("Bad ANS chunk magic 0x%08X." % magic)
        if version != CONTAINER_VERSION:
            raise IOError("Unsupported ANS container version %d." % version)
        if scale_bits != rans.SCALE_BITS:
            raise IOError("Unsupported ANS scale_bits %d." % scale_bits)
        off = _HEADER.size
        planes = []
        for _p in range(itemsize):
            mode = mv[off]; off += 1
            if mode == MODE_CONST:
                planes.append({'mode': mode, 'value': mv[off]})
                off += 1
            elif mode == MODE_RAW:
                raw = np.frombuffer(mv, np.uint8, n_elems, off)
                planes.append({'mode': mode, 'raw': raw})
                off += n_elems
            elif mode == MODE_RANS:
                freqs = np.frombuffer(mv, '<u2', 256, off); off += 512
                (n_words,) = struct.unpack_from('<I', mv, off); off += 4
                states = np.frombuffer(mv, '<u4', K, off); off += 4 * K
                words = np.frombuffer(mv, '<u2', n_words, off)
                off += 2 * n_words
                planes.append({'mode': mode, 'freqs': freqs, 'states': states,
                               'words': words, 'n_lanes': K})
            else:
                raise IOError("Unknown ANS plane mode %d." % mode)
        if off != len(mv):
            raise IOError("ANS chunk has %d trailing bytes." % (len(mv) - off))
        return {'itemsize': itemsize, 'n_lanes': K, 'n_elems': n_elems,
                'zigzag': bool(flags & 1), 'planes': planes}
