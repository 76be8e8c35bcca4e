"""Native SentencePiece .model tests: proto wire round-trip + golden
segmentations for the BPE and unigram models.

The released AVEC tokenizers are BPE ModelProtos (functions.py:193-194:
model_type="bpe", bos_id=-1, eos_id=-1, unk_surface=""). These goldens are
hand-derived from sentencepiece's documented BPE semantics: merge the
adjacent pair whose concatenation is the highest-scoring piece, leftmost
first on ties; normalization prepends the dummy prefix and escapes spaces
to U+2581.
"""

import numpy as np

from avec_tpu.utils.spm_model import (
    BPE,
    CONTROL,
    NORMAL,
    UNIGRAM,
    UNKNOWN,
    SentencePieceModel,
    bpe_model_from_pieces,
)
from avec_tpu.utils.tokenizer import load_tokenizer

B = "▁"

# id: piece (score, type) — a tiny BPE model over {a, b}.
PIECES = [
    ("<unk>", 0.0, UNKNOWN),        # 0
    ("<s>", 0.0, CONTROL),          # 1
    ("</s>", 0.0, CONTROL),         # 2
    (B + "ab", -0.0, NORMAL),       # 3: best merge (score 0 > all below)
    ("ab", -1.0, NORMAL),           # 4
    (B + "a", -2.0, NORMAL),        # 5
    (B + "b", -3.0, NORMAL),        # 6
    ("a", -4.0, NORMAL),            # 7
    ("b", -5.0, NORMAL),            # 8
    (B, -6.0, NORMAL),              # 9
]


def _model():
    pieces, scores, types = zip(*PIECES)
    return SentencePieceModel(pieces, scores, types, BPE)


def test_proto_roundtrip(tmp_path):
    m = _model()
    path = str(tmp_path / "tok.model")
    m.save(path)
    m2 = SentencePieceModel.from_file(path)
    assert m2.pieces == m.pieces
    np.testing.assert_allclose(m2.scores, m.scores)
    assert m2.types == m.types
    assert m2.model_type == BPE
    # load_tokenizer dispatches .model to the native parser.
    tok = load_tokenizer(path)
    assert tok.vocab_size() == len(PIECES)


def test_bpe_golden_segmentations():
    m = _model()
    # "ab" -> norm "▁ab": pairs (▁,a)->▁a(-2), (a,b)->ab(-1); best ab;
    # then (▁,ab) -> ▁ab (score 0). Single piece id 3.
    assert m.encode("ab") == [3]
    # "b ab" -> "▁b▁ab": (▁,b)->▁b(-3), (b,▁) none, (▁,a)->▁a, (a,b)->ab(-1)
    # best ab -> ▁ b ▁ ab? wait: symbols ▁ b ▁ a b: merge (a,b)->ab(-1) ->
    # ▁ b ▁ ab; then (▁,ab)->▁ab(0) -> ▁ b ▁ab; then (▁,b)->▁b(-3) -> ▁b ▁ab.
    assert m.encode("b ab") == [6, 3]
    # "aa" -> "▁aa": (▁,a)->▁a(-2), (a,a) none -> ▁a a -> ids [5, 7].
    assert m.encode("aa") == [5, 7]
    # unknown char -> unk id (no byte pieces in this model).
    assert m.encode("z") == [0, 0] or m.encode("z") == [9, 0] or \
        m.encode("z")[-1] == 0
    # whitespace collapsing (remove_extra_whitespaces).
    assert m.encode("  ab   ab ") == [3, 3]


def test_bpe_leftmost_tie_break():
    # Two possible merges with the SAME score: leftmost wins.
    pieces = [("<unk>", 0.0, UNKNOWN), ("xy", -1.0, NORMAL),
              ("yz", -1.0, NORMAL), ("x", -2.0, NORMAL), ("y", -3.0, NORMAL),
              ("z", -4.0, NORMAL), (B, -5.0, NORMAL)]
    p, s, t = zip(*pieces)
    m = SentencePieceModel(p, s, t, BPE)
    # "xyz" -> ▁ x y z: (x,y) and (y,z) both score -1 -> merge xy first
    # -> ▁ xy z -> ids [▁, xy, z].
    assert m.encode("xyz") == [6, 1, 5]


def test_decode_unk_surface_and_controls():
    m = _model()
    # unk_surface="" and control pieces decode to nothing (functions.py:194).
    assert m.decode([0, 3, 1, 2]) == "ab"
    assert m.decode([6, 3]) == "b ab"
    assert m.decode([[6, 3], [3]]) == ["b ab", "ab"]


def test_unigram_viterbi():
    pieces = [("<unk>", 0.0, UNKNOWN), (B + "ab", -1.0, NORMAL),
              (B + "a", -2.0, NORMAL), ("b", -2.5, NORMAL),
              (B, -5.0, NORMAL), ("a", -3.0, NORMAL)]
    p, s, t = zip(*pieces)
    m = SentencePieceModel(p, s, t, UNIGRAM)
    # "ab": path [▁ab] = -1 beats [▁a, b] = -4.5.
    assert m.encode("ab") == [1]
    # "aa": only [▁a, a] = -5.0 (vs unk paths, much lower).
    assert m.encode("aa") == [2, 5]


def test_bpe_model_from_trained_pieces_roundtrip(tmp_path):
    """Our train_bpe piece list -> .model file -> identical encode/decode."""
    from avec_tpu.utils.tokenizer import Tokenizer, train_bpe

    corpus = ["hello world", "hello there world", "the quick brown fox"]
    pieces = train_bpe(corpus, 48)
    m = bpe_model_from_pieces(pieces)
    path = str(tmp_path / "trained.model")
    m.save(path)
    m2 = load_tokenizer(path)
    for text in corpus:
        ids = m2.encode(text)
        assert m2.decode(ids) == text, (text, ids, m2.decode(ids))


def test_byte_fallback_pieces():
    pieces = ([("<unk>", 0.0, UNKNOWN), (B, -1.0, NORMAL)]
              + [(f"<0x{b:02X}>", -2.0, 6) for b in range(256)])
    p, s, t = zip(*pieces)
    m = SentencePieceModel(p, s, t, BPE)
    ids = m.encode("Ω")  # U+03A9 = 0xCE 0xA9
    assert ids[1:] == [2 + 0xCE, 2 + 0xA9]
    assert m.decode(ids) == "Ω"
