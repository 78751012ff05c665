"""FFT backend compatibility probe.

XLA:TPU supports complex64 FFTs, but some remote-TPU runtimes (e.g. the
experimental relay used in CI here) lack complex arithmetic entirely. The
Fourier ops (downsample, bandpass) probe once and fall back to host numpy
FFTs when the accelerator cannot run them — correctness over placement for
these preprocessing steps (they are a tiny fraction of pipeline time).
"""

import numpy as np

_fft_ok = None


def device_fft_available() -> bool:
    global _fft_ok
    if _fft_ok is None:
        import jax.numpy as jnp
        try:
            x = jnp.fft.fft(jnp.ones(8, jnp.float32))
            _ = np.asarray(x)  # force execution (async backends)
            _fft_ok = True
        except Exception:
            _fft_ok = False
    return _fft_ok
