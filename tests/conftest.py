"""Test configuration: force CPU with 8 virtual devices.

The sandbox's sitecustomize pins ``JAX_PLATFORMS=axon`` (remote TPU tunnel);
tests must run hermetically on CPU with a virtual 8-device mesh — the
TPU-native analogue of a fake distributed backend (SURVEY.md §4).
``jax.config.update`` is required because the env var is overridden.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from tapclip_tpu.config import TINY_TEST, PromptConfig


@pytest.fixture(scope="session")
def tiny_cfg():
    return TINY_TEST


@pytest.fixture(scope="session")
def tiny_params(tiny_cfg):
    from tapclip_tpu.models import clip as C

    return C.init_clip_params(jax.random.PRNGKey(0), tiny_cfg)


@pytest.fixture(scope="session")
def tiny_prompt_cfg():
    return PromptConfig(max_classes=8)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
