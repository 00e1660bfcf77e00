"""The tg-webui drop-in pipeline package imports and exposes the reference
protocol without text-generation-webui installed (visualcla.py falls back to a
stub AbstractMultimodalPipeline).  Reference surface:
scripts/inference/text_generation_webui/visualcla/pipelines.py:1-21 and
visualcla.py:85-161."""
import importlib.util
import os
import sys

import numpy as np
import pytest

SHIM = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "integrations", "text_generation_webui",
)


def _import_shim():
    if SHIM not in sys.path:
        sys.path.insert(0, SHIM)
    import visualcla_tpu_pipeline.pipelines as pipelines  # noqa: PLC0415

    return pipelines


def test_shim_imports_without_webui():
    pipelines = _import_shim()
    assert pipelines.available_pipelines == ["visualcla-7b-tpu"]


def test_shim_protocol_constants():
    _import_shim()
    from visualcla_tpu_pipeline.visualcla import VisualCLA_7B_TPU_Pipeline as P

    assert P.image_start() == "<img>"
    assert P.image_end() == "</img>"
    assert P.image_placeholder() == "<img_token>"
    assert P.num_image_embeds() == 64
    assert P.placeholder_token_id() == 49957
    assert P.visualcla_projector_shape() == (1024, 4096)
    assert P.name() == "visualcla-7b-tpu"


def test_shim_registry_dispatch(monkeypatch):
    pipelines = _import_shim()
    # construction needs webui settings + a checkpoint; intercept the class
    import visualcla_tpu_pipeline.visualcla as vmod

    made = []

    class Fake(vmod.VisualCLA_7B_TPU_Pipeline):
        def __init__(self, params):  # skip model loading
            made.append(params)

    monkeypatch.setattr(vmod, "VisualCLA_7B_TPU_Pipeline", Fake)
    assert pipelines.get_pipeline("visualcla-7b-tpu", {"a": 1}) is not None
    assert pipelines.get_pipeline("other", {}) is None
    assert pipelines.get_pipeline_from_model_name("visualcla-7b-merged", {}) is not None
    assert pipelines.get_pipeline_from_model_name("llama-7b", {}) is None
    assert made == [{"a": 1}, {}]


def test_shim_embed_images_via_vision_pipeline(tmp_path, monkeypatch):
    """embed_images runs the real VisionPipeline on a tiny native checkpoint
    and returns a flattened (N*num_embeds, H) float tensor."""
    torch = pytest.importorskip("torch")
    from tests.test_api import make_native_ckpt

    ckpt, _ = make_native_ckpt(str(tmp_path))
    _import_shim()
    import visualcla_tpu_pipeline.visualcla as vmod
    from visualcla_tpu.pipeline import VisionPipeline

    pipe = VisionPipeline.from_any(str(ckpt))

    class Shared:  # minimal stand-in for modules.shared
        class model:
            device = "cpu"
            dtype = torch.float32

        settings = {}

    monkeypatch.setattr(vmod, "_shared", lambda: Shared)
    p = vmod.VisualCLA_7B_TPU_Pipeline.__new__(vmod.VisualCLA_7B_TPU_Pipeline)
    p.pipeline = pipe

    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    )
    out = p.embed_images([img, img])
    n_embeds = pipe.num_image_embeds
    hidden = pipe.cfg.text_config.hidden_size if pipe.cfg.text_config else None
    assert out.shape[0] == 2 * n_embeds
    if hidden:
        assert out.shape[1] == hidden
    assert out.dtype == torch.float32


def test_chat_picture_splice():
    """Image goes BEFORE the text (VisualCLA's trained order), or replaces an
    explicit <image> placeholder; short edge resized into [224, 300]."""
    from PIL import Image

    _import_shim()
    from visualcla_tpu_pipeline.chat_picture import add_chat_picture_visualcla

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (100, 400, 3), np.uint8)
    )
    text, visible = add_chat_picture_visualcla(img, "describe it", "")
    assert text.startswith('<img src="data:image/jpeg;base64,')
    assert text.endswith("\ndescribe it")
    assert visible == text

    text2, _ = add_chat_picture_visualcla(img, "look: <image> here", "x")
    assert "<image>" not in text2 and "look: <img" in text2

    # aspect 4:1 -> short edge clamps to max(300/4, 224) = 224
    import re

    m = re.search(r'base64,([^"]+)', text)
    import base64, io

    resized = Image.open(io.BytesIO(base64.b64decode(m.group(1))))
    assert min(resized.size) == 224
    assert max(resized.size) == 224 * 4
