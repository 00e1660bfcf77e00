"""VisualCLA multimodal pipeline for text-generation-webui, TPU image tower.

Behavioral port of the reference plugin
(/root/reference/scripts/inference/text_generation_webui/visualcla/visualcla.py:19-161):
same protocol constants (``<img>``/``</img>`` markers, 64 image embeds,
placeholder token id 49957, 1024->4096 projection) and the same settings keys
(``visualcla_merged_model`` / ``visualcla_vision_lora_model``), but
CLIP-ViT + resampler + projector run as one jitted JAX program on TPU
(visualcla_tpu.pipeline.VisionPipeline) instead of three torch modules.

The module imports cleanly WITHOUT text-generation-webui installed (webui
modules are imported lazily / stubbed) so it can be unit-tested standalone.
"""
from typing import List, Tuple

import numpy as np

try:  # inside a webui checkout
    from extensions.multimodal.abstract_pipeline import AbstractMultimodalPipeline
except ImportError:  # standalone import (tests): minimal structural stand-in
    from abc import ABC

    class AbstractMultimodalPipeline(ABC):  # type: ignore[no-redef]
        pass


def _shared():
    """webui's global state module (lazy so standalone import works)."""
    from modules import shared

    return shared


class VisualCLA_TPU_Pipeline(AbstractMultimodalPipeline):
    CLIP_REPO = "openai/clip-vit-large-patch14"

    def __init__(self, params: dict) -> None:
        super().__init__()
        self.pipeline = self._load_models()

    def _load_models(self):
        import time

        from visualcla_tpu.pipeline import VisionPipeline

        start_ts = time.time()
        settings = _shared().settings
        if "visualcla_merged_model" in settings:
            pipe = VisionPipeline.from_any(settings["visualcla_merged_model"])
        elif "visualcla_vision_lora_model" in settings:
            pipe = VisionPipeline.from_webui_split(
                settings["visualcla_vision_lora_model"],
                settings.get("visualcla_clip_model", self.CLIP_REPO),
            )
        else:
            raise KeyError(
                "Expect one of 'visualcla_merged_model' and "
                "'visualcla_vision_lora_model' in settings-visualcla.yaml, "
                "but neither was set."
            )
        print(f"VisualCLA TPU vision pipeline loaded in "
              f"{time.time() - start_ts:.2f}s")
        return pipe

    @staticmethod
    def image_start() -> str:
        return "<img>"

    @staticmethod
    def image_end() -> str:
        return "</img>"

    @staticmethod
    def image_placeholder() -> str:
        return "<img_token>"

    @staticmethod
    def num_image_embeds() -> int:
        return 64

    @staticmethod
    def embed_tokens(input_ids):
        """Text embeds come from the webui host's own (torch) LLM."""
        shared = _shared()
        if hasattr(shared.model.model, "embed_tokens"):
            func = shared.model.model.embed_tokens
        else:
            func = shared.model.model.model.embed_tokens  # AutoGPTQ case
        return func(input_ids).to(shared.model.device, dtype=shared.model.dtype)

    @staticmethod
    def placeholder_embeddings():
        from modules.text_generation import encode

        return VisualCLA_TPU_Pipeline.embed_tokens(
            encode(
                VisualCLA_TPU_Pipeline.image_placeholder()
                * VisualCLA_TPU_Pipeline.num_image_embeds(),
                add_bos_token=False,
            )[0]
        )

    def embed_images(self, images: List["object"]):
        """PIL images -> (N*64, 4096) torch tensor on the host model device.

        The TPU runs preprocess+ViT+resampler+projector in one jitted call;
        only the final (N, 64, 4096) embeddings cross back to the host."""
        import torch

        feats = self.pipeline.embed_images(images)  # (N, 64, 4096) np
        flat = np.ascontiguousarray(
            feats.reshape(-1, feats.shape[-1]).astype(np.float32)
        )
        shared = _shared()
        return torch.from_numpy(flat).to(
            shared.model.device, dtype=shared.model.dtype
        )

    @staticmethod
    def visualcla_projector_shape() -> Tuple[int, int]:
        return (1024, 4096)


class VisualCLA_7B_TPU_Pipeline(VisualCLA_TPU_Pipeline):
    def __init__(self, params: dict) -> None:
        super().__init__(params)

    @staticmethod
    def name() -> str:
        return "visualcla-7b-tpu"

    @staticmethod
    def placeholder_token_id() -> int:
        return 49957
