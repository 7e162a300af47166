"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Mirrors the reference's cluster-free testing intent (`template/mock.py`,
SURVEY.md §4) — multi-chip sharding semantics are validated on host CPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the runtime pre-sets axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The runtime's sitecustomize registers the axon TPU backend and pins
# JAX_PLATFORMS=axon; the env var alone doesn't stick — force via config.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: XLA-on-CPU compiles are expensive in this runtime
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402


@pytest.fixture(scope="module")
def tiny_pipeline_module():
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.utils.testing import perturb_zero_params

    pipe = build_pipeline("zeroscope-tiny", seed=0)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    return pipe


@pytest.fixture(scope="session")
def tiny_hf_pipeline():
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.utils.testing import perturb_zero_params

    pipe = build_pipeline("zeroscope-tiny-hf", seed=0)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    return pipe


@pytest.fixture(scope="session")
def tiny_pipeline():
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.utils.testing import perturb_zero_params

    pipe = build_pipeline("zeroscope-tiny", seed=0)
    # fill zero-init output projections so signal flows through temporal /
    # cross-attention paths (fresh models are identity there by design)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    return pipe
