from .cache import enable_compilation_cache, enable_cpu_compilation_cache  # noqa: F401
