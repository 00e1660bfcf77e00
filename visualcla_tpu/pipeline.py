"""Standalone vision pipeline — the webui multimodal-plugin equivalent.

The reference's text-generation-webui plugin
(scripts/inference/text_generation_webui/visualcla/visualcla.py:32-129) loads
CLIP + resampler + projector WITHOUT the LLM and embeds images into 64
LLM-space vectors for injection by an external host (placeholder token id
49957, 64 embeds of width 4096, image markers ``<img>``/``</img>``).

``VisionPipeline`` provides that capability on the TPU stack, loading from:
- a native/merged VisualCLA checkpoint (vision+resampler+projection subtrees), or
- the webui split format written by ``checkpoint.split_adapter``
  (visual_resampler_model.bin + image_projection_layer_model.bin +
  visual_resampler_config.json + CLIP base [+ vision LoRA]).
"""
from __future__ import annotations

import json
import logging
import os
from typing import Optional

import numpy as np

from .core.config import ResamplerConfig, ViTConfig, VisualCLAConfig
from .processor import ImageProcessor

logger = logging.getLogger(__name__)


class VisionPipeline:
    """images -> (N, num_image_tokens, llm_hidden) embeddings on device."""

    def __init__(self, params: dict, cfg: VisualCLAConfig, image_processor=None,
                 dtype=None):
        import jax
        import jax.numpy as jnp

        from .models import visualcla as vmod

        self.cfg = cfg
        self.params = params
        self.image_processor = image_processor or ImageProcessor(
            image_size=cfg.vision_config.image_size,
            patch_size=cfg.vision_config.patch_size,
        )
        self.dtype = dtype or jnp.bfloat16
        self._encode = jax.jit(
            lambda p, px: vmod.encode_image(p, cfg, px)
        )

    @property
    def num_image_embeds(self) -> int:
        """64 for the shipped model (webui visualcla.py:95-97)."""
        return self.cfg.num_image_tokens

    def embed_images(self, images) -> np.ndarray:
        import jax.numpy as jnp

        pixel_values = self.image_processor(images)["pixel_values"]
        out = self._encode(self.params, jnp.asarray(pixel_values, self.dtype))
        return np.asarray(out)

    # -- loaders ---------------------------------------------------------------

    @classmethod
    def from_pretrained(cls, path: str, dtype=None) -> "VisionPipeline":
        """Load from a native checkpoint dir (vision-side subtrees only)."""
        from .checkpoint.serialize import load_checkpoint

        params, cfg = load_checkpoint(path, dtype=dtype)
        vision_params = {k: params[k] for k in ("vision", "resampler", "projection")
                         if k in params}
        ip = (ImageProcessor.from_pretrained(path)
              if os.path.exists(os.path.join(path, "preprocessor_config.json"))
              else None)
        return cls(vision_params, cfg, ip, dtype=dtype)

    @classmethod
    def from_reference_merged(cls, path: str, dtype=None) -> "VisionPipeline":
        """Load the vision side straight from a reference merged dir
        (vision_encoder/ + pytorch_model.bin with visual_resampler.* and
        image_projection_layer.* keys — the layout the reference webui plugin
        reads, visualcla.py:38-60), without converting the 13GB text tower."""
        from .checkpoint.mapping import (
            projection_tree_from_sd, resampler_tree_from_sd, vit_tree_from_sd,
        )
        from .checkpoint.torch_io import load_state_dict

        vision_sd = load_state_dict(os.path.join(path, "vision_encoder"))
        root_sd = load_state_dict(path)
        cfg = VisualCLAConfig.from_pretrained(path)
        params = {
            "vision": vit_tree_from_sd(vision_sd),
            "projection": projection_tree_from_sd(root_sd),
        }
        # merged dirs without a resampler (use_visual_resampler=False) ship
        # no visual_resampler.* keys — same gate as from_pretrained
        if cfg.use_visual_resampler:
            params["resampler"] = resampler_tree_from_sd(root_sd)
        ip = (ImageProcessor.from_pretrained(path)
              if os.path.exists(os.path.join(path, "preprocessor_config.json"))
              else None)
        import jax.numpy as jnp

        params = _cast_floats(params, dtype or jnp.bfloat16)
        return cls(params, cfg, ip, dtype=dtype)

    @classmethod
    def from_any(cls, path: str, dtype=None, **kwargs) -> "VisionPipeline":
        """Sniff the checkpoint layout and dispatch: native (params.safetensors),
        reference merged (vision_encoder/), or webui split
        (visual_resampler_model.bin — pass ``clip_model=`` for this one)."""
        if os.path.exists(os.path.join(path, "params.safetensors")):
            return cls.from_pretrained(path, dtype=dtype)
        if os.path.isdir(os.path.join(path, "vision_encoder")):
            return cls.from_reference_merged(path, dtype=dtype)
        if os.path.exists(os.path.join(path, "visual_resampler_model.bin")):
            clip_model = kwargs.pop("clip_model", None)
            if clip_model is None:
                raise ValueError(
                    f"{path} is a webui-split vision dir; pass clip_model="
                    "<CLIP checkpoint dir> to load it"
                )
            return cls.from_webui_split(path, clip_model, dtype=dtype, **kwargs)
        raise FileNotFoundError(
            f"{path}: no params.safetensors, vision_encoder/, or "
            "visual_resampler_model.bin — not a recognizable checkpoint layout"
        )

    @classmethod
    def from_webui_split(
        cls,
        vision_dir: str,
        clip_model: str,
        vision_lora: Optional[str] = None,
        dtype=None,
    ) -> "VisionPipeline":
        """Load the split format of ``checkpoint.split_adapter`` /
        convert_ckpt_for_tgwebui.py: CLIP base (+ optional vision LoRA folded)
        + full resampler + projector weights."""
        from .checkpoint import lora as lora_lib
        from .checkpoint.mapping import (
            projection_tree_from_sd, resampler_tree_from_sd, vit_tree_from_sd,
        )
        from .checkpoint.torch_io import load_file, load_state_dict

        clip_sd = load_state_dict(clip_model)
        adapter_path = os.path.join(vision_dir, "adapter_model.bin")
        if vision_lora or os.path.exists(adapter_path):
            asd, acfg = lora_lib.load_adapter(vision_lora or vision_dir)
            clip_sd = lora_lib.fold_lora(clip_sd, asd, acfg)
        res_sd = load_file(os.path.join(vision_dir, "visual_resampler_model.bin"))
        proj_sd = load_file(
            os.path.join(vision_dir, "image_projection_layer_model.bin")
        )
        params = {
            "vision": vit_tree_from_sd(clip_sd),
            "resampler": resampler_tree_from_sd(res_sd, prefix=""),
            "projection": projection_tree_from_sd(proj_sd, prefix=""),
        }
        with open(os.path.join(vision_dir, "visual_resampler_config.json")) as f:
            res_cfg = ResamplerConfig.from_hf_dict(json.load(f))
        # ViT config from the CLIP model dir (like the reference plugin,
        # webui visualcla.py:40-47); handles flat CLIPVisionConfig and
        # full-CLIP {"vision_config": ...} jsons
        with open(os.path.join(clip_model, "config.json")) as f:
            clip_cfg = json.load(f)
        cfg = VisualCLAConfig(
            vision_config=ViTConfig.from_hf_dict(
                clip_cfg.get("vision_config", clip_cfg)
            ),
            visual_resampler_config=res_cfg,
        )
        import jax.numpy as jnp

        params = _cast_floats(params, dtype or jnp.bfloat16)
        return cls(params, cfg, dtype=dtype)


# -- pipeline registry (reference webui pipelines.py:1-21) -------------------

PIPELINES = {"visualcla-7b": VisionPipeline}


def get_pipeline(name: str, *args, **kwargs):
    if name in PIPELINES:
        return PIPELINES[name], name
    return None, None


def get_pipeline_from_model_name(model_name: str, *args, **kwargs):
    """Name-sniffing lookup like the reference ('visualcla' + '7b' in name)."""
    lowered = model_name.lower()
    if "visualcla" in lowered and "7b" in lowered:
        return PIPELINES["visualcla-7b"], "visualcla-7b"
    return None, None


def _cast_floats(tree, dtype):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: jnp.asarray(x, dtype)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else jnp.asarray(x),
        tree,
    )
