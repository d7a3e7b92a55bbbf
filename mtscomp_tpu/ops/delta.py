"""Delta transform and its exact inverse (host/NumPy entry points).

The codec's transform stage: first-order difference along time (axis 0)
and/or space (axis 1), keeping the leading row/column verbatim so each
chunk stays self-contained (reference semantics: mtscomp.py:143-169).

Exactness contract: for integer dtypes both the diff and the cumsum are
computed **in the array dtype**, so both wrap modulo 2**bits and the
round trip is byte-exact. For floats the round trip is only close to
within ``CHECK_ATOL`` (reference: mtscomp.py:59, 880-886).

Device (jnp / Pallas) implementations with identical semantics live in
``mtscomp_tpu.ops.device_delta``.
"""

import numpy as np


def diff_along_axis(chunk, axis=None):
    """First-order diff along ``axis``; row/column 0 is kept verbatim.

    ``axis=None`` is the identity (used when a diff direction is disabled).
    """
    if axis is None:
        return chunk
    assert 0 <= axis < chunk.ndim
    out = np.empty_like(chunk, subok=False)
    if axis == 0:
        out[:1, :] = chunk[:1, :]
        np.subtract(chunk[1:, :], chunk[:-1, :], out=out[1:, :])
    else:
        out[:, :1] = chunk[:, :1]
        np.subtract(chunk[:, 1:], chunk[:, :-1], out=out[:, 1:])
    return out


def cumsum_along_axis(chunk, axis=None, inplace=False):
    """Inverse of :func:`diff_along_axis`: in-dtype cumulative sum.

    The accumulation dtype equals the input dtype on purpose — modular
    wraparound is what makes the integer round trip byte-exact.

    For the hot shape — axis 0 of a C-contiguous 2-D integer array —
    the sum runs in the native runtime, which walks memory row-major
    (NumPy's axis-0 cumsum strides column-by-column, cache-hostile at
    hundreds of channels; the native loop is ~10x faster on the
    385-channel decode path and bit-identical). ``inplace=True`` lets a
    caller that owns the buffer (the decode path: codec output is
    private) skip the defensive copy; the input may then be mutated and
    returned.
    """
    if axis is None:
        return chunk
    assert 0 <= axis < chunk.ndim
    if axis == 0 and chunk.ndim == 2 and chunk.dtype.kind in 'iu':
        from .. import native
        if inplace and chunk.flags.c_contiguous and chunk.flags.writeable:
            if native.cumsum_axis0_inplace(chunk):
                return chunk
        out = np.ascontiguousarray(chunk)
        out = out.copy() if out is chunk else out
        if native.cumsum_axis0_inplace(out):
            return out
    out = np.empty_like(chunk, subok=False)
    np.cumsum(chunk, axis=axis, out=out)
    return out
