"""Device meshes for multi-chip codec runs.

The codec's natural parallel axis is the chunk batch (embarrassingly
parallel, mirroring the reference's thread pool over chunks,
mtscomp.py:456/691) — sharded over ICI with no cross-chunk
communication. Multi-host deployments split the chunk *range* per host
and concatenate offset tables, exactly like the reference's ordered
batch write-back.
"""

import numpy as np


def chunk_mesh(devices=None, n_devices=None):
    """A 1-D mesh over the 'chunks' axis.

    ``n_devices`` requests an exact width (raises when fewer devices
    exist — a silently narrower mesh would later fail the batch-divide
    assertion, or run at reduced parallelism unnoticed); it is an error
    to pass both arguments.
    """
    import jax
    from jax.sharding import Mesh
    if devices is not None and n_devices is not None:
        raise ValueError("Pass devices OR n_devices, not both.")
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    "Requested a %d-device mesh but only %d devices "
                    "are available." % (n_devices, len(devices)))
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ('chunks',))
