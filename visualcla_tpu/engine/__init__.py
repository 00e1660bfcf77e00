from .generate import DecodeState, Engine  # noqa: F401
from .sampling import SamplingConfig, default_sampling_config, sample_step  # noqa: F401
from .server import Request, Scheduler, ServingEngine, generate_sync  # noqa: F401
