"""Edge cases: extreme image sizes, out-of-range token ids, SP proto round trip."""
import numpy as np
import pytest

from visualcla_tpu.processor.pil_resample import resize_uint8, shortest_edge_size
from visualcla_tpu.text import SPModel, VisualCLATokenizer, build_test_model
from visualcla_tpu.text import sp_bpe


@pytest.mark.parametrize("h,w", [(225, 224), (223, 897), (3000, 224),
                                 (17, 700)])
def test_resize_extreme_aspect_ratios(h, w):
    from PIL import Image

    rng = np.random.default_rng(h ^ w)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    nh, nw = shortest_edge_size(h, w, 224)
    ours = resize_uint8(img, (nw, nh))
    theirs = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BICUBIC))
    assert np.array_equal(ours, theirs)


def test_resize_tiny_images():
    from PIL import Image

    rng = np.random.default_rng(0)
    for h, w in [(1, 64), (2, 2), (5, 224)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ours = resize_uint8(img, (32, 16))
        theirs = np.asarray(Image.fromarray(img).resize((32, 16), Image.BICUBIC))
        assert np.array_equal(ours, theirs), (h, w)


def test_decode_out_of_range_ids():
    sp = build_test_model(["a", "b"], [-1.0, -2.0])
    tok = VisualCLATokenizer(sp, use_native=False)
    tok.add_special_tokens(("<pad>", "<img>", "</img>", "<img_token>"))
    ids = tok.encode("ab") + [99999, -5]
    out = tok.decode(ids, skip_special_tokens=True)
    assert isinstance(out, str)  # must not raise


def test_sp_proto_roundtrip(tmp_path):
    sp = build_test_model(["a", "b", "ab", "你好"], [-4.0, -3.0, -1.0, -2.0])
    path = str(tmp_path / "tok.model")
    sp.save(path)
    loaded = SPModel.load(path)
    assert loaded.pieces == sp.pieces
    assert loaded.scores == pytest.approx(sp.scores)
    assert loaded.types == sp.types
    assert loaded.model_type == "BPE"
    assert loaded.add_dummy_prefix == sp.add_dummy_prefix
    for s in ("ab 你好", "b a ab"):
        assert sp_bpe.encode(loaded, s) == sp_bpe.encode(sp, s)


def test_empty_and_whitespace_prompts():
    sp = build_test_model(["a", "b", "ab"], [-3.0, -2.0, -1.0])
    tok = VisualCLATokenizer(sp, use_native=False)
    assert tok.encode("") == []
    ids = tok.encode("   ")
    assert tok.decode(ids) == "   "
