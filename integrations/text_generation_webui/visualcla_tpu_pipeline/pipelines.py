"""text-generation-webui multimodal pipeline entry points (TPU backend).

Drop this directory into ``extensions/multimodal/pipelines/`` of a
text-generation-webui checkout and select ``--multimodal-pipeline
visualcla-7b-tpu``.  Mirrors the entry surface of the reference plugin
(/root/reference/scripts/inference/text_generation_webui/visualcla/pipelines.py:1-21);
the image tower runs on TPU via visualcla_tpu while the webui host keeps
driving its own (torch) LLM.
"""
from typing import Optional

available_pipelines = ["visualcla-7b-tpu"]


def get_pipeline(name: str, params: dict) -> Optional[object]:
    if name == "visualcla-7b-tpu":
        from .visualcla import VisualCLA_7B_TPU_Pipeline

        return VisualCLA_7B_TPU_Pipeline(params)
    return None


def get_pipeline_from_model_name(model_name: str, params: dict) -> Optional[object]:
    if "visualcla" not in model_name.lower():
        return None
    if "7b" in model_name.lower():
        from .visualcla import VisualCLA_7B_TPU_Pipeline

        return VisualCLA_7B_TPU_Pipeline(params)
    return None
