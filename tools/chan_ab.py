"""Staged device decode rate vs channel count (fresh process per run).

Quantifies the channel-tail penalty of the aligned-segment layout:
C=384 (3x128, uniform 470-step groups) vs C=385 (a 193rd one-channel
segment -> a 7th group whose stacked cell still scans the full max) —
measured 20.4 vs 16.0-16.3 GB/s on the dev attachment. See STATUS.md
"385th-channel tail" for the mechanism and the op-counted fixes
(group-transposed cell binning is the first A/B on real silicon).

Usage: python tools/chan_ab.py C   (e.g. 385, then 384; >= 2 fresh
processes per variant, interleaved, per CLAUDE.md timing rules)"""
import os, sys, tempfile, time
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

C = int(sys.argv[1])
import jax
jax.config.update('jax_compilation_cache_dir', os.path.expanduser('~/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import mtscomp_tpu.config as cfg
tmp = Path(tempfile.mkdtemp(dir='/dev/shm'))
cfg.CONFIG_PATH = tmp / '.mtscomp'
from mtscomp_tpu import compress, decompress
from mtscomp_tpu.parallel.pipeline import (DeviceBatchDecoder, _read_payload,
                                           check_words_used)
T, SR = 30000, 30000.0
rng = np.random.default_rng(0)
arr = np.cumsum(rng.normal(0.0, 6.0, size=(T * 8, C)), axis=0).astype(np.int16)
raw = tmp / 'b.bin'; arr.tofile(raw)
compress(raw, tmp / 'b.cbin', tmp / 'b.ch', sample_rate=SR, n_channels=C,
         dtype='int16', algorithm='ans', quiet=True, check_after_compress=False)
r = decompress(tmp / 'b.cbin', tmp / 'b.ch', quiet=True)
parsed = [r.codec.parse(_read_payload(r, i)) for i in range(r.n_chunks)]
dec = DeviceBatchDecoder(r)
assert dec.supported(parsed, T)
fn, dev_args = dec.pack(parsed, T)
out, used = fn(*dev_args)
check_words_used(parsed, used)
assert np.array_equal(np.asarray(out).reshape(arr.shape), arr)
inner = 8
def run_once():
    for _ in range(inner):
        o, _u = fn(*dev_args)
    return float(jnp.sum(o[:, ::61, ::17].astype(jnp.float32)))
run_once()
times = []
for _ in range(8):
    t1 = time.time(); run_once(); times.append(time.time() - t1)
dt = sorted(times)[len(times) // 2] / inner
print('{"C": %d, "gbps": %.3f}' % (C, arr.nbytes / 1e9 / dt))
r.close()
import shutil; shutil.rmtree(tmp)
