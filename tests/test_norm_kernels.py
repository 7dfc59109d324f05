"""Fused GroupNorm(+SiLU) Pallas kernel vs the unfused nn path (interpret
mode on CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instancediffusion_tpu.nn import core as nn
from instancediffusion_tpu.kernels.norms import (
    _unfused, fused_group_norm,
)


@pytest.mark.parametrize(
    "n,c,g", [(64, 320, 32), (256, 640, 32), (16, 512, 32)]
)
def test_fused_matches_unfused(n, c, g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((2, n, c), dtype=np.float32) * 3 + 0.5,
        jnp.bfloat16,
    )
    scale = jnp.asarray(rng.standard_normal(c, dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(c, dtype=np.float32))
    for act in ("none", "silu"):
        ref = _unfused(x, scale, bias, g, 1e-5, act)
        out = fused_group_norm(x, scale, bias, g, 1e-5, act, True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05,
        )


def test_fused_matches_nn_group_norm_semantics():
    """_unfused must be the same math as nn.group_norm's bf16 path (the
    kernel's backward differentiates _unfused, so they must agree)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 320), dtype=np.float32),
                    jnp.bfloat16)
    p = {
        "scale": jnp.asarray(rng.standard_normal(320, dtype=np.float32)),
        "bias": jnp.asarray(rng.standard_normal(320, dtype=np.float32)),
    }
    ref = nn.group_norm(p, x)  # CPU -> unfused bf16 path
    out = _unfused(x, p["scale"], p["bias"], 32, 1e-5, "none")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1e-6, atol=1e-6,
    )


def test_fused_group_norm_grad():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 64), dtype=np.float32),
                    jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(64, dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(64, dtype=np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(
            fused_group_norm(x, s, b, 32, 1e-5, "silu", True).astype(
                jnp.float32
            ) ** 2
        )

    def loss_ref(x, s, b):
        return jnp.sum(
            _unfused(x, s, b, 32, 1e-5, "silu").astype(jnp.float32) ** 2
        )

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.1,
        )


def test_fused_layer_norm_matches_unfused():
    from instancediffusion_tpu.kernels.norms import (
        _ln_unfused, fused_layer_norm,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.standard_normal((2, 64, 320), dtype=np.float32) * 2 - 1,
        jnp.bfloat16,
    )
    scale = jnp.asarray(rng.standard_normal(320, dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(320, dtype=np.float32))
    ref = _ln_unfused(x, scale, bias, 1e-5)
    out = fused_layer_norm(x, scale, bias, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.03, atol=0.03,
    )


def test_fused_layer_norm_grad():
    from instancediffusion_tpu.kernels.norms import (
        _ln_unfused, fused_layer_norm,
    )

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 16, 64), dtype=np.float32),
                    jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(64, dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(64, dtype=np.float32))
    g1 = jax.grad(
        lambda x, s, b: jnp.sum(
            fused_layer_norm(x, s, b, 1e-5, True).astype(jnp.float32) ** 2
        ),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    g2 = jax.grad(
        lambda x, s, b: jnp.sum(
            _ln_unfused(x, s, b, 1e-5).astype(jnp.float32) ** 2
        ),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.1,
        )
