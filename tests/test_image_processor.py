"""Image preprocessing parity vs the HF/PIL stack (the reference's exact path)."""
import numpy as np
import pytest

from visualcla_tpu.processor import ImageProcessor, device_preprocess
from visualcla_tpu.processor.pil_resample import (
    center_crop,
    resize_uint8,
    shortest_edge_size,
)


def random_image(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


SIZES = [(336, 448), (448, 336), (224, 224), (1080, 720), (250, 97), (224, 640)]


@pytest.mark.parametrize("h,w", SIZES)
def test_resize_matches_pil_bicubic(h, w):
    from PIL import Image

    rng = np.random.default_rng(h * 1000 + w)
    img = random_image(rng, h, w)
    nh, nw = shortest_edge_size(h, w, 224)
    ours = resize_uint8(img, (nw, nh), "bicubic")
    theirs = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BICUBIC))
    assert ours.shape == theirs.shape
    assert np.array_equal(ours, theirs), (
        f"max diff {np.abs(ours.astype(int) - theirs.astype(int)).max()}"
    )


def test_resize_matches_pil_bilinear():
    from PIL import Image

    rng = np.random.default_rng(7)
    img = random_image(rng, 300, 500)
    ours = resize_uint8(img, (224, 240), "bilinear")
    theirs = np.asarray(Image.fromarray(img).resize((224, 240), Image.BILINEAR))
    assert np.array_equal(ours, theirs)


def test_upscale_matches_pil():
    from PIL import Image

    rng = np.random.default_rng(8)
    img = random_image(rng, 100, 160)
    ours = resize_uint8(img, (320, 224), "bicubic")
    theirs = np.asarray(Image.fromarray(img).resize((320, 224), Image.BICUBIC))
    assert np.array_equal(ours, theirs)


@pytest.mark.parametrize("h,w", SIZES)
def test_full_pipeline_matches_hf_clip(h, w):
    from transformers import CLIPImageProcessor

    rng = np.random.default_rng(h + w)
    img = random_image(rng, h, w)
    from PIL import Image

    pil = Image.fromarray(img)
    hf = CLIPImageProcessor(
        size={"shortest_edge": 224}, crop_size={"height": 224, "width": 224}
    )
    theirs = hf(pil, return_tensors="np")["pixel_values"]
    ours = ImageProcessor()([pil])["pixel_values"]
    assert ours.shape == theirs.shape == (1, 3, 224, 224)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-6)


def test_non_rgb_inputs_convert():
    """Grayscale / RGBA / palette PIL images match HF's handling (convert RGB)."""
    from PIL import Image
    from transformers import CLIPImageProcessor

    rng = np.random.default_rng(9)
    hf = CLIPImageProcessor(size={"shortest_edge": 224},
                            crop_size={"height": 224, "width": 224})
    ours = ImageProcessor()
    gray = Image.fromarray(rng.integers(0, 256, (300, 260), dtype=np.uint8), "L")
    rgba = Image.fromarray(
        rng.integers(0, 256, (260, 300, 4), dtype=np.uint8), "RGBA"
    )
    for im in (gray, rgba):
        theirs = hf(im.convert("RGB"), return_tensors="np")["pixel_values"]
        got = ours([im])["pixel_values"]
        np.testing.assert_allclose(got, theirs, atol=1e-6)


def test_center_crop_pads_small_images():
    img = np.full((100, 100, 3), 7, np.uint8)
    out = center_crop(img, 224, 224)
    assert out.shape == (224, 224, 3)
    assert out[0, 0, 0] == 0 and out[112, 112, 0] == 7


def test_device_preprocess_close_to_host():
    rng = np.random.default_rng(3)
    img = random_image(rng, 336, 448)
    host = ImageProcessor()([img])["pixel_values"]
    import jax.numpy as jnp

    dev = np.asarray(device_preprocess(jnp.asarray(img[None])))
    assert dev.shape == host.shape
    # device path skips the inter-pass uint8 quantize/clip, so worst-case pixels
    # on noise images differ by a few LSB; bulk must be within ~1.5/255
    # after normalization (std ~0.27)
    d = np.abs(dev - host)
    assert np.percentile(d, 99.9) < 0.05
    assert d.max() < 0.3


def test_processor_bundle():
    from visualcla_tpu.processor import VisualCLAProcessor
    from visualcla_tpu.text import VisualCLATokenizer, build_test_model

    sp = build_test_model(["a", "b", "ab"], [-3.0, -2.0, -1.0])
    tok = VisualCLATokenizer(sp, use_native=False)
    tok.add_special_tokens(("<pad>", "<img>", "</img>", "<img_token>"))
    proc = VisualCLAProcessor(ImageProcessor(), tok)
    rng = np.random.default_rng(0)
    out = proc(text=["ab", "a"], images=[random_image(rng, 256, 256)])
    assert out["input_ids"].shape[0] == 2
    assert out["attention_mask"][1].sum() <= out["attention_mask"][0].sum() + 1
    assert out["pixel_values"].shape == (1, 3, 224, 224)
