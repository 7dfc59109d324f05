"""Fused GEGLU feed-forward kernel vs the unfused formula (interpret mode
on CPU; compiles via Mosaic on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from instancediffusion_tpu.kernels.geglu_ff import _ff_unfused, fused_ff_geglu


def _params(rng, c, inner):
    w1 = jnp.asarray(rng.standard_normal((c, 2 * inner), dtype=np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal(2 * inner, dtype=np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((inner, c), dtype=np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal(c, dtype=np.float32) * 0.05)
    return w1, b1, w2, b2


def test_fused_ff_matches_unfused():
    rng = np.random.default_rng(0)
    c, inner = 64, 256
    x = jnp.asarray(rng.standard_normal((2, 128, c), dtype=np.float32),
                    jnp.bfloat16)
    w1, b1, w2, b2 = _params(rng, c, inner)
    ref = _ff_unfused(x, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2)
    out = fused_ff_geglu(x, w1, b1, w2, b2, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_ff_grad():
    rng = np.random.default_rng(1)
    c, inner = 32, 128
    x = jnp.asarray(rng.standard_normal((1, 16, c), dtype=np.float32),
                    jnp.bfloat16)
    w1, b1, w2, b2 = _params(rng, c, inner)

    g1 = jax.grad(
        lambda *a: jnp.sum(fused_ff_geglu(*a, True).astype(jnp.float32) ** 2),
        argnums=(0, 1, 3),
    )(x, w1, b1, w2, b2)
    g2 = jax.grad(
        lambda *a: jnp.sum(_ff_unfused(*a).astype(jnp.float32) ** 2),
        argnums=(0, 1, 3),
    )(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.1,
        )
