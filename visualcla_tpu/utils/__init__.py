from .cache import enable_compilation_cache  # noqa: F401
