"""CLI driver tests (pass mode for every config; one tiny training run)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ,
           JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=8")


def _run(*args, timeout=600):
    return subprocess.run([sys.executable, "main.py", *args], cwd=REPO,
                          env=ENV, capture_output=True, text=True,
                          timeout=timeout)


def test_pass_mode_lrw():
    r = _run("-c", "configs/LRW/EffConfCE.py", "-m", "pass")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Mode: pass" in r.stdout


def test_pass_mode_lm():
    r = _run("-c", "configs/LibriSpeechCorpus/GPT-Small.py", "-m", "pass")
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_training_smoke_lm(tmp_path):
    """2 optimizer steps of the GPT-Small config end-to-end through main.py.

    (GPT-Small is the lightest full model; the conformer models are covered
    by engine tests.)"""
    r = _run("-c", "configs/LibriSpeechCorpus/GPT-Small.py", "-m", "training",
             "--steps_per_epoch", "2", "--eval_steps", "1", "--epochs", "1",
             "--step_log_period", "1", timeout=3000)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])
    assert "Built GPT-Small" in r.stdout
