"""visualcla_tpu — TPU-native framework with the capabilities of
airaria/Visual-Chinese-LLaMA-Alpaca.

Public surface mirrors the reference package
(/root/reference/models/visualcla/__init__.py:1-8):
``chat``, ``chat_in_stream``, ``get_model_and_tokenizer_and_processor``,
``hijack_samplers`` plus the model/config classes — implemented on JAX/XLA/Pallas.
"""

__version__ = "0.1.0"

from .core.config import (  # noqa: F401
    LlamaConfig,
    ResamplerConfig,
    ViTConfig,
    VisualCLAConfig,
)


def __getattr__(name):
    # Lazy imports keep `import visualcla_tpu` light (no TPU/engine init on import).
    if name in ("chat", "chat_in_stream", "get_model_and_tokenizer_and_processor",
                "hijack_samplers", "VisualCLA", "DEFAULT_GENERATION_CONFIG",
                "load_generation_preset", "as_sampling_config"):
        from . import api

        return getattr(api, name)
    if name == "VisionPipeline":
        from .pipeline import VisionPipeline

        return VisionPipeline
    raise AttributeError(f"module 'visualcla_tpu' has no attribute {name!r}")
