"""CLI end-to-end: train on the synthetic fixture via the train CLI, then
evaluate via the test CLI (reference surface: ``train.py``/``test.py`` —
SURVEY.md §2.5)."""

import json
import os

import numpy as np
import pytest

from deeplio_tpu.cli import test as test_cli
from deeplio_tpu.cli import train as train_cli

pytestmark = [pytest.mark.integration, pytest.mark.slow]


def test_train_then_eval_cli(tmp_path):
    wd = str(tmp_path / "run")
    train_cli.main([
        "-c", "configs/deepio_synth.yaml",
        "--workdir", wd,
        "--epochs", "2",
        "--batch-size", "8",
    ])
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))

    test_cli.main([
        "-c", "configs/deepio_synth.yaml",
        "--workdir", wd,
        "--split", "test",
    ])
    scores_path = os.path.join(wd, "eval", "scores.json")
    assert os.path.exists(scores_path)
    scores = json.load(open(scores_path))
    assert len(scores) == 1
    for name, s in scores.items():
        assert np.isfinite(s["ate_m"])
        assert np.isfinite(s["rpe_trans_m"])
        # Trajectory + GT files written.
        assert os.path.exists(os.path.join(wd, "eval", f"{name}_pred.txt"))
        assert os.path.exists(os.path.join(wd, "eval", f"{name}_gt.txt"))


def test_resume_flag(tmp_path):
    wd = str(tmp_path / "run")
    train_cli.main(["-c", "configs/deepio_synth.yaml", "--workdir", wd,
                    "--epochs", "1", "--batch-size", "8"])
    # Second invocation resumes and continues without error.
    train_cli.main(["-c", "configs/deepio_synth.yaml", "--workdir", wd,
                    "--epochs", "1", "--batch-size", "8", "--resume"])
