from .flash_attention import flash_attention  # noqa: F401
