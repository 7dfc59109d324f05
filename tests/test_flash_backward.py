"""Flash attention custom VJP vs XLA attention gradients (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instancediffusion_tpu.kernels.flash_attention import (
    flash_attention_trainable,
)
from instancediffusion_tpu.ops.attention import sdpa_xla


@pytest.mark.parametrize("n,m,c", [(128, 128, 40), (160, 77, 32)])
def test_flash_grads_match_xla(n, m, c):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 2, n, c), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, m, c), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, m, c), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((1, 2, n, c), dtype=np.float32))

    def loss_flash(q, k, v):
        out = flash_attention_trainable(q, k, v, 64, 64, True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) * w)

    o1 = loss_flash(q, k, v)
    o2 = loss_xla(q, k, v)
    np.testing.assert_allclose(float(o1), float(o2), rtol=2e-3)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name}",
        )
