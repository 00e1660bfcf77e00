from . import clip_vit, llama, resampler, visualcla  # noqa: F401
