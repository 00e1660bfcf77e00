"""Tokenizer + prompt protocol tests.

The SP-BPE encoder is differential-tested against the HF ``tokenizers`` Rust
BPE configured to mimic sentencepiece (no pre-tokenizer, ▁-escaped input,
byte fallback, merge ranks = -scores) — an independent implementation of the
same algorithm.
"""
import numpy as np
import pytest

from visualcla_tpu.text import (
    SPModel,
    VisualCLATokenizer,
    build_prompt,
    build_test_model,
    encoding_text,
)
from visualcla_tpu.text.prompt import PROMPT_TEMPLATE_MULTIMODAL
from visualcla_tpu.text import sp_bpe


def make_bpe_fixture():
    """Train a small BPE with `tokenizers` on a mixed zh/en corpus; return
    (SPModel, tokenizers.Tokenizer with identical ids)."""
    import tokenizers
    from tokenizers import Tokenizer, models, trainers

    corpus = [
        "▁Below▁is▁an▁instruction▁that▁describes▁a▁task.",
        "▁Write▁a▁response▁that▁appropriately▁completes▁the▁request.",
        "▁###▁Instruction:▁图片里有什么?",
        "▁###▁Response:▁图中是一只拉布拉多犬。",
        "▁the▁quick▁brown▁fox▁jumps▁over▁the▁lazy▁dog",
        "▁你好,世界!▁hello▁world",
    ] * 4
    base_chars = sorted(set("".join(corpus)))
    tok = Tokenizer(models.BPE(unk_token=None, byte_fallback=True))
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        special_tokens=[],
        initial_alphabet=base_chars,
        show_progress=False,
    )
    tok.train_from_iterator(corpus, trainer)
    # rebuild both tokenizers over a shared id space:
    # [unk,bos,eos] + 256 bytes + alphabet/merged pieces in rank order
    merges = []
    vocab_r = sorted(tok.get_vocab().items(), key=lambda kv: kv[1])
    pieces = [p for p, _ in vocab_r]
    # derive merges from the trained model by re-walking ranks: tokenizers
    # stores merges internally; easiest is to retrain via the files API
    import json
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        tok.model.save(d)
        with open(os.path.join(d, "merges.txt")) as f:
            for ln, line in enumerate(f):
                line = line.rstrip("\n")
                if (ln == 0 and line.startswith("#version")) or not line:
                    continue
                a, b = line.split(" ")
                merges.append((a, b))
        with open(os.path.join(d, "vocab.json")) as f:
            vocab_json = json.load(f)

    alphabet = [p for p in pieces if len(p) == 1]
    merged = [a + b for a, b in merges]
    offset = 3 + 256
    ordered = alphabet + merged
    # scores: alphabet pieces get low scores (never selected as merges);
    # merged pieces score = -rank
    scores = [-1e6] * len(alphabet) + [-float(r) for r in range(len(merged))]
    sp = build_test_model(ordered, scores, byte_fallback=True)

    new_vocab = {p: offset + i for i, p in enumerate(ordered)}
    for b in range(256):
        new_vocab[f"<0x{b:02X}>"] = 3 + b
    ref = Tokenizer(
        models.BPE(
            vocab=new_vocab,
            merges=merges,
            unk_token=None,
            byte_fallback=True,
            fuse_unk=False,
        )
    )
    return sp, ref


@pytest.fixture(scope="module")
def bpe_pair():
    return make_bpe_fixture()


TEST_STRINGS = [
    "the quick brown fox",
    "图片里有什么?",
    "### Instruction: \n你好,世界! hello world\n\n### Response:",
    "Below is an instruction that describes a task. ",
    "emoji \U0001f600 and unk chars éü中",
    "",
    "   leading and trailing   ",
    "a",
    "droite-à-gauche שלום",
]


def test_bpe_matches_hf_tokenizers(bpe_pair):
    sp, ref = bpe_pair
    for s in TEST_STRINGS:
        escaped = ("▁" + s).replace(" ", "▁") if s else ""
        ours = sp_bpe.encode_bpe(sp, escaped)
        theirs = ref.encode(escaped, add_special_tokens=False).ids if escaped else []
        assert ours == theirs, f"mismatch on {s!r}: {ours} vs {theirs}"


def test_bpe_decode_roundtrip(bpe_pair):
    sp, _ = bpe_pair
    for s in TEST_STRINGS:
        if not s:
            continue
        ids = sp_bpe.encode(sp, s)
        out = sp_bpe.decode_pieces(sp, ids)
        # SP normalization collapses nothing here (remove_extra_whitespaces=False)
        assert out == s, f"roundtrip {s!r} -> {out!r}"


def test_unigram_viterbi_picks_best_segmentation():
    # vocab: 'ab' scores better than 'a'+'b'
    sp = build_test_model(
        ["a", "b", "ab", "abc", "c"], [-2.0, -2.0, -1.0, -5.0, -2.0],
        byte_fallback=True, add_dummy_prefix=False,
    )
    sp = SPModel(**{**sp.__dict__, "model_type": "UNIGRAM", "piece_to_id": {}, "byte_to_id": None})
    ids = sp_bpe.encode(sp, "abc")
    toks = [sp.pieces[i] for i in ids]
    assert toks == ["ab", "c"]  # -1 + -2 beats -5 and -2-2-2


def test_byte_fallback_roundtrip():
    sp = build_test_model(["a", "b"], [-1.0, -2.0])
    ids = sp_bpe.encode(sp, "aéb")
    assert sp_bpe.decode_pieces(sp, ids) == "aéb"
    byte_ids = [i for i in ids if sp.types[i] == 6]
    # é (2 utf-8 bytes) + the ▁ dummy prefix itself (3 bytes; not in this tiny vocab)
    assert len(byte_ids) == 5


# ---------------------------------------------------------------------------
# VisualCLATokenizer surface
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tokenizer(bpe_pair):
    sp, _ = bpe_pair
    tok = VisualCLATokenizer(sp, use_native=False)
    tok.add_special_tokens(("<pad>", "<img>", "</img>", "<img_token>"))
    return tok


def test_special_token_ids_appended(tokenizer):
    V = tokenizer.vocab_size
    assert tokenizer.pad_token_id == V
    assert tokenizer.img_start_token_id == V + 1
    assert tokenizer.img_end_token_id == V + 2
    assert tokenizer.img_token_id == V + 3
    assert len(tokenizer) == V + 4


def test_encode_splits_specials(tokenizer):
    text = "<s>ab<img>" + "<img_token>" * 3 + "</img>ab"
    ids = tokenizer.encode(text)
    assert ids[0] == tokenizer.bos_token_id
    assert ids.count(tokenizer.img_token_id) == 3
    i = ids.index(tokenizer.img_start_token_id)
    assert ids[i + 4] == tokenizer.img_end_token_id
    # legacy: segment after </img> got a dummy prefix; skip_special_tokens drops
    # the markers and sp-decodes the remaining pieces [▁ab, ▁ab] -> "ab ab"
    # (matches HF LlamaTokenizer.decode semantics)
    assert tokenizer.decode(ids) == "ab ab"


def test_decode_skip_specials(tokenizer):
    ids = tokenizer.encode("ab") + [tokenizer.eos_token_id, tokenizer.pad_token_id]
    assert tokenizer.decode(ids, skip_special_tokens=True) == "ab"


# ---------------------------------------------------------------------------
# prompt protocol (reference modeling_utils.py:49-80)
# ---------------------------------------------------------------------------

def test_prompt_first_turn():
    p = build_prompt([], "图片里有什么?")
    assert p == (
        PROMPT_TEMPLATE_MULTIMODAL
        + "### Instruction: \n<image_placeholder>\n图片里有什么?\n\n### Response:"
    )


def test_prompt_multi_turn_order():
    history = [
        {"type": "instruction", "value": "turn1", "first_instruction": True},
        {"type": "response", "value": "resp1"},
        {"type": "instruction", "value": "turn2"},
        {"type": "response", "value": "resp2"},
    ]
    p = build_prompt(history, "turn3")
    assert p == (
        PROMPT_TEMPLATE_MULTIMODAL
        + "### Instruction: \n<image_placeholder>\nturn1\n\n"
        + "### Response:resp1\n\n"
        + "### Instruction: \nturn2\n\n"
        + "### Response:resp2\n\n"
        + "### Instruction: \nturn3\n\n### Response:"
    )


def test_prompt_rejects_bad_type():
    with pytest.raises(ValueError):
        build_prompt([{"type": "bogus", "value": "x"}], "t")


def test_encoding_text_expands_placeholder(tokenizer):
    enc = encoding_text([], "hello", num_patch=4, tokenizer=tokenizer)
    ids = enc["input_ids"][0].tolist()
    assert ids[0] == tokenizer.bos_token_id
    assert ids.count(tokenizer.img_token_id) == 4
    i = ids.index(tokenizer.img_start_token_id)
    assert ids[i + 5] == tokenizer.img_end_token_id
    assert enc["attention_mask"].shape == enc["input_ids"].shape
    assert np.all(enc["attention_mask"] == 1)
