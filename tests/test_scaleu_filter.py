"""ScaleU Fourier filter: the algebraic low-frequency projection must match
the masked-FFT formulation exactly (threshold=1 touches only the
{0,-1}x{0,-1} frequency bins)."""

import numpy as np
import jax.numpy as jnp
import pytest

from instancediffusion_tpu.models.unet import _fourier_filter_fft, fourier_filter


@pytest.mark.heavy
def test_projection_matches_fft():
    rng = np.random.default_rng(0)
    for h, w in [(8, 8), (16, 16), (8, 16), (6, 10)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, 5), dtype=np.float32))
        s = jnp.asarray([0.37], jnp.float32)
        ours = np.asarray(fourier_filter(x, 1, s))
        ref = np.asarray(_fourier_filter_fft(x, 1, s))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_scale_one_is_identity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3), dtype=np.float32))
    out = np.asarray(fourier_filter(x, 1, jnp.asarray([1.0])))
    np.testing.assert_allclose(out, np.asarray(x), rtol=1e-5, atol=1e-6)
