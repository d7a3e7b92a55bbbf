"""Streaming compression: append samples as they are acquired.

The reference compresses completed files only, yet its headline claim is
"4x faster than real time" (README.md:173-176) — i.e. the natural
deployment is compressing a recording WHILE it is acquired.
``StreamWriter`` provides that: feed ``(n, n_channels)`` sample blocks
of any size as they arrive; every full chunk is delta-transformed,
entropy-coded and written out immediately (bounded memory: one chunk
buffered), and ``close()`` flushes the final partial chunk and emits the
sidecar. The output is **byte-identical** to running ``compress`` on the
finished recording with the same parameters (same chunk geometry from
``compute_chunk_bounds``, same codecs, same SHA1 bookkeeping), so files
written live are indistinguishable from batch-compressed ones.

Usage::

    with StreamWriter('live.cbin', 'live.ch', sample_rate=30000.,
                      n_channels=385, dtype='int16',
                      algorithm='ans') as w:
        for block in acquisition:        # any block sizes
            w.append(block)
    # live.cbin/.ch now equal compress() of the concatenated blocks.

Thread-compatible with an acquisition loop: ``append`` does the codec
work inline (call it from a worker thread to overlap with acquisition);
each call writes complete chunks straight to disk.
"""

import hashlib
from pathlib import Path

import numpy as np

from .codec import get_codec
from .config import read_config
from .format import build_cmeta, write_cmeta
from .ops.delta import diff_along_axis
from .utils.misc import logger


class StreamWriter:
    """Incrementally compress an unbounded stream of sample blocks."""

    def __init__(self, out, outmeta, sample_rate=None, n_channels=None,
                 dtype=None, **kwargs):
        self.quiet = kwargs.pop('quiet', True)
        config = read_config(**kwargs)
        self.config = config
        if not sample_rate:
            raise ValueError("Please provide a sample rate.")
        if not n_channels:
            raise ValueError("Please provide n_channels.")
        if not dtype:
            raise ValueError("Please provide a dtype.")
        self.sample_rate = float(sample_rate)
        self.n_channels = int(n_channels)
        self.dtype = np.dtype(dtype)
        self.algorithm = config.algorithm
        self.do_time_diff = config.do_time_diff
        self.do_spatial_diff = config.do_spatial_diff
        self.chunk_order = config.chunk_order
        self.comp_level = config.comp_level
        self.codec = get_codec(
            self.algorithm, seg_log2=config.get('ans_seg_log2', 16),
            channel_aligned=config.get('ans_channel_segments', True),
            table_mode=config.get('ans_table_mode', 'plane'))
        self.chunk_size = int(np.round(config.chunk_duration
                                       * self.sample_rate))
        assert self.chunk_size > 0
        self.out = Path(out)
        self.outmeta = Path(outmeta)
        self.out.parent.mkdir(exist_ok=True, parents=True)
        self._fb = open(self.out, 'wb')
        # Preallocated one-chunk staging buffer, filled in place: every
        # appended sample is copied exactly once, and the writer never
        # aliases a caller's (possibly reused) acquisition buffer.
        self._buffer = np.empty((self.chunk_size, self.n_channels),
                                dtype=self.dtype)
        self._fill = 0
        self.chunk_bounds = [0]
        self.chunk_offsets = [0]
        self.n_samples = 0
        self.sha1_compressed = hashlib.sha1()
        self.sha1_uncompressed = hashlib.sha1()
        self._closed = False
        self._ratio = None

    # -- feeding ------------------------------------------------------------

    def append(self, samples):
        """Add a ``(n, n_channels)`` block; full chunks are written out."""
        assert not self._closed, "StreamWriter is closed"
        samples = np.asarray(samples)
        if samples.ndim == 1:
            samples = samples.reshape(-1, self.n_channels)
        assert samples.ndim == 2 and samples.shape[1] == self.n_channels
        assert samples.dtype == self.dtype, \
            "block dtype %s != stream dtype %s" % (samples.dtype, self.dtype)
        pos, n = 0, samples.shape[0]
        while pos < n:
            take = min(self.chunk_size - self._fill, n - pos)
            self._buffer[self._fill:self._fill + take] = \
                samples[pos:pos + take]
            self._fill += take
            pos += take
            if self._fill == self.chunk_size:
                self._flush_chunk(self._buffer)
                self._fill = 0

    def _flush_chunk(self, chunk):
        chunk = np.ascontiguousarray(chunk)
        chunkd = diff_along_axis(chunk,
                                 axis=0 if self.do_time_diff else None)
        chunkd = diff_along_axis(chunkd,
                                 axis=1 if self.do_spatial_diff else None)
        payload = self.codec.encode(chunkd, order=self.chunk_order)
        self._fb.write(payload)
        self.n_samples += chunk.shape[0]
        self.chunk_bounds.append(self.n_samples)
        self.chunk_offsets.append(self.chunk_offsets[-1] + len(payload))
        self.sha1_uncompressed.update(chunk)
        self.sha1_compressed.update(payload)
        logger.debug("Streamed chunk %d (%d samples).",
                     len(self.chunk_bounds) - 2, chunk.shape[0])

    # -- finalize -----------------------------------------------------------

    def close(self):
        """Flush the trailing partial chunk and write the sidecar.

        Returns the compressed/raw size ratio. The stream must have
        received at least one sample (empty recordings are rejected,
        matching ``Writer.open``'s ``n_samples > 0`` contract).
        """
        if self._closed:
            return self._ratio
        if self._fill:
            self._flush_chunk(self._buffer[:self._fill])
            self._fill = 0
        self._fb.close()
        if self.n_samples == 0:
            self.out.unlink(missing_ok=True)
            self._closed = True
            raise ValueError("Cannot finalize an empty stream.")
        extra = {}
        if self.algorithm == 'ans':
            extra['ans_seg_log2'] = self.codec.seg_log2
            if self.codec.table_mode != 'plane':
                extra['ans_table_mode'] = self.codec.table_mode
        write_cmeta(self.outmeta, build_cmeta(
            algorithm=self.algorithm, comp_level=self.comp_level,
            do_time_diff=self.do_time_diff,
            do_spatial_diff=self.do_spatial_diff,
            dtype=self.dtype, n_channels=self.n_channels,
            sample_rate=self.sample_rate, chunk_bounds=self.chunk_bounds,
            chunk_offsets=self.chunk_offsets, chunk_order=self.chunk_order,
            sha1_compressed=self.sha1_compressed.hexdigest(),
            sha1_uncompressed=self.sha1_uncompressed.hexdigest(),
            shape=(self.n_samples, self.n_channels), extra=extra))
        raw = self.n_samples * self.n_channels * self.dtype.itemsize
        self._ratio = self.chunk_offsets[-1] / raw
        self._closed = True
        if not self.quiet:
            logger.info("Closed stream %s: %d samples, ratio %.3f.",
                        self.out, self.n_samples, self._ratio)
        return self._ratio

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        else:
            # Abort: leave no half-written outputs behind.
            self._fb.close()
            self.out.unlink(missing_ok=True)
            self._closed = True
