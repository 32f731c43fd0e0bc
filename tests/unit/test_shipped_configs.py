"""Every shipped YAML config must parse, validate, and build its model."""

import glob

import jax
import pytest

from deeplio_tpu.config import load_config
from deeplio_tpu.models import build_model, example_batch

CONFIGS = sorted(glob.glob("configs/*.yaml"))


def test_configs_found():
    assert len(CONFIGS) >= 5


@pytest.mark.parametrize("path", CONFIGS)
def test_config_parses_and_model_builds(path):
    cfg = load_config(path)
    model = build_model(cfg)
    # Shape-check the batch contract without running the full init
    # (KITTI-sized models are heavy for CPU CI): eval_shape traces only.
    batch = example_batch(cfg, 1)
    out = jax.eval_shape(
        lambda b: model.init_with_output(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, b, train=False)[0],
        batch)
    x, q = out
    assert x.shape == (1, cfg.datasets.num_pairs, 3)
    assert q.shape == (1, cfg.datasets.num_pairs, 4)
