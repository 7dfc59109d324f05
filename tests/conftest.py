"""Test config: force CPU JAX with an 8-device virtual mesh (stands in for a
v5e-8 slice; SURVEY §4 test strategy).

The session pre-registers a real-TPU backend ("axon") via sitecustomize and
pins it with jax.config.update("jax_platforms", ...) — which beats the
JAX_PLATFORMS env var. So force the config back to cpu here, before any
backend is initialized: tests must be deterministic, multi-device, and not
compete with benchmarks for the one real chip."""

import os

# Tests are asset-free by design: opt into the hash-fallback tokenizer
# (flagship paths refuse it otherwise — see data/tokenizer.require_real)
os.environ.setdefault("IDTPU_ALLOW_HASH_TOKENIZER", "1")

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("JAX_PLATFORM_NAME", None)
_flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
_flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(_flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA:CPU's default matmul path (oneDNN) is low-precision (~bf16-level error
# vs torch fp32); golden parity tests need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: XLA:CPU compiles are minutes on this 1-core
# host and dominate suite wall-clock; repeat runs hit the cache. NOT the
# bench's cache dir: a pytest run concurrent with bench.py polluted the
# bench's entry-count accounting and masqueraded as axon cache-key
# nondeterminism for a whole round (docs/PERF.md round-4 postmortem).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "IDTPU_COMPILE_CACHE_CPU",
        os.path.expanduser("~/.cache/idtpu_xla_cpu_tests"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

assert len(jax.devices()) >= 8 and jax.devices()[0].platform == "cpu", (
    f"conftest failed to force the 8-device CPU mesh: "
    f"{len(jax.devices())}x {jax.devices()[0].platform}"
)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_pipe():
    """ONE shared tiny pipeline for the e2e tests (test_pipeline, test_dpm,
    test_img2img): random_init + per-variant tracing dominates fast-tier
    wall-clock on this 1-core host, and generate/img2img never mutate
    params, so sharing the instance (and its _sample_cache) is safe.
    Tests that mutate params (test_lora's load_lora) build their own."""
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

    from tests.test_pipeline import tiny_config

    pipe = InstanceDiffusionPipeline.random_init(tiny_config(), seed=0)
    # teardown invariant: the "never mutates" safety claim is enforced, not
    # just commented — jax arrays are immutable, so identity equality of
    # every param leaf catches any test swapping weights on the shared pipe
    leaf_ids = [
        id(leaf)
        for tree in (pipe.params.unet, pipe.params.vae, pipe.params.clip)
        for leaf in jax.tree_util.tree_leaves(tree)
    ]
    cfg_repr = repr(pipe.cfg)
    yield pipe
    leaf_ids_after = [
        id(leaf)
        for tree in (pipe.params.unet, pipe.params.vae, pipe.params.clip)
        for leaf in jax.tree_util.tree_leaves(tree)
    ]
    assert leaf_ids_after == leaf_ids, (
        "a test mutated the session-shared tiny_pipe's params — give that "
        "test its own pipeline instance (see the tiny_pipe docstring)"
    )
    assert repr(pipe.cfg) == cfg_repr, (
        "a test mutated the session-shared tiny_pipe's config"
    )
