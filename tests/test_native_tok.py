"""Native C++ tokenizer core vs the pure-Python spec — differential tests."""
import numpy as np
import pytest

from visualcla_tpu.text import sp_bpe
from visualcla_tpu.text.sp_model import build_test_model


@pytest.fixture(scope="module")
def native_and_model():
    from tests.test_text import make_bpe_fixture

    sp, _ = make_bpe_fixture()
    from visualcla_tpu.text.native_tok import NativeEncoder

    return NativeEncoder(sp), sp


STRINGS = [
    "the quick brown fox jumps over the lazy dog",
    "图片里有什么?",
    "### Instruction: \n你好,世界! hello world\n\n### Response:",
    "Below is an instruction that describes a task. ",
    "emoji \U0001f600 and unk chars éü中",
    "",
    "  double  spaces  ",
    "a",
    "混合 mixed 中英文 text with 标点。！？",
]


def test_native_matches_python(native_and_model):
    native, sp = native_and_model
    for s in STRINGS:
        ours = sp_bpe.encode(sp, s)
        theirs = native.encode(s)
        assert ours == theirs, f"mismatch on {s!r}"


def test_native_no_dummy_prefix(native_and_model):
    native, sp = native_and_model
    for s in ("hello", "图片"):
        assert native.encode(s, dummy_prefix=False) == sp_bpe.encode(
            sp, s, dummy_prefix=False
        )


def test_native_byte_fallback():
    from visualcla_tpu.text.native_tok import NativeEncoder

    sp = build_test_model(["a", "b", "ab"], [-3.0, -2.0, -1.0])
    native = NativeEncoder(sp)
    for s in ("aéb", "ab\x00ab", "🎉"):
        assert native.encode(s) == sp_bpe.encode(sp, s)


def test_native_fuzz_random_strings(native_and_model):
    native, sp = native_and_model
    rng = np.random.default_rng(0)
    alphabet = list("abcdefgh 你好图片###\n:!?") + ["🙂", "é"]
    for _ in range(200):
        n = int(rng.integers(0, 40))
        s = "".join(rng.choice(alphabet) for _ in range(n))
        assert native.encode(s) == sp_bpe.encode(sp, s), repr(s)


def test_no_native_env_falls_back(monkeypatch):
    """VISUALCLA_NO_NATIVE=1 forces the pure-Python paths everywhere."""
    monkeypatch.setenv("VISUALCLA_NO_NATIVE", "1")
    import importlib

    from visualcla_tpu.processor import image as img_mod
    from visualcla_tpu.processor import native_img
    from visualcla_tpu.text import VisualCLATokenizer
    from visualcla_tpu.text import native_tok

    # fresh lib state: the loaders check the env at build time
    monkeypatch.setattr(native_img, "_LIB", None)
    monkeypatch.setattr(native_tok, "_LIB", None)
    sp = build_test_model(["a", "b", "ab"], [-3.0, -2.0, -1.0])
    tok = VisualCLATokenizer(sp, use_native=True)
    assert tok._native is None  # fell back silently
    assert tok.encode("ab") == sp_bpe.encode(sp, "ab")

    ip = img_mod.ImageProcessor(use_native=True)
    assert not ip._native
    out = ip.preprocess_one(
        np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    )
    assert out.shape == (3, 224, 224)


def test_remove_extra_whitespaces_mode():
    """Both implementations honor remove_extra_whitespaces=True identically."""
    import dataclasses

    from visualcla_tpu.text.native_tok import NativeEncoder

    sp = build_test_model(["a", "b", "ab", "▁a"], [-3.0, -2.0, -1.0, -1.5])
    sp = dataclasses.replace(sp, remove_extra_whitespaces=True,
                             piece_to_id={}, byte_to_id=None)
    native = NativeEncoder(sp)
    for s in ("  a  b  ", "a b", "   ", "ab   ab"):
        assert native.encode(s) == sp_bpe.encode(sp, s), repr(s)


def test_tokenizer_uses_native_when_available():
    from visualcla_tpu.text import VisualCLATokenizer

    sp = build_test_model(["a", "b", "ab"], [-3.0, -2.0, -1.0])
    tok = VisualCLATokenizer(sp, use_native=True)
    assert tok._native is not None
    tok_py = VisualCLATokenizer(sp, use_native=False)
    for s in ("abab", "a b ab", "xyz"):
        assert tok.encode(s) == tok_py.encode(s)
