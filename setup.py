"""Install script for visualcla_tpu.

TPU-native (JAX/XLA/Pallas) framework with the capabilities of
airaria/Visual-Chinese-LLaMA-Alpaca (reference: /root/reference/setup.py:7-29).
"""
from setuptools import setup, find_packages

setup(
    name="visualcla_tpu",
    version="0.1.0",
    description="TPU-native multimodal Chinese chat framework (CLIP-ViT + visual resampler + LLaMA)",
    packages=find_packages(include=["visualcla_tpu", "visualcla_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "numpy",
        "einops",
    ],
    extras_require={
        "convert": ["torch", "safetensors"],
        "test": ["pytest", "torch", "transformers"],
    },
)
