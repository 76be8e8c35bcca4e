"""Config smoke tests: every shipped config must import (the reference's
`--mode pass`, main.py:109-110) and expose the engine contract globals."""

import importlib
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    "configs.LRS23.AO.EffConfCTC",
    "configs.LRS23.VO.EffConfInterCTC",
    "configs.LRS23.AV.EffConfInterCTC",
    "configs.LRS23.LM.GPT-Small",
    "configs.LRS23.LM.GPT-Small-demo",
    "configs.LRW.EffConfCE",
    "configs.LibriSpeechCorpus.GPT-Small",
    "configs.Synthetic.AO-Tone",
    "configs.Synthetic.AV-Tone",
    "configs.Synthetic.LM-Tone",
]


@pytest.mark.parametrize("name", CONFIGS)
def test_config_imports_and_contract(name):
    sys.path.insert(0, REPO)
    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        if name in sys.modules:
            del sys.modules[name]
        cfg = importlib.import_module(name)
    finally:
        os.chdir(cwd)
    # Engine contract (ref main.py:66-106): compiled model + datasets.
    assert hasattr(cfg, "model")
    assert cfg.model.compiled
    assert hasattr(cfg, "training_dataset")
    assert hasattr(cfg, "evaluation_dataset")
    assert hasattr(cfg, "callback_path")
    ds = cfg.training_dataset
    assert ds.batch_size is not None and ds.collate_fn is not None
    sample = ds[0]
    batch = ds.collate_fn([sample])
    assert "inputs" in batch and "targets" in batch
