"""CLIP image preprocessing — host-exact path + fused on-device path.

Replaces HF ``CLIPImageProcessor`` as used by the reference
(models/visualcla/modeling_utils.py:130-131, 149-154): shortest-edge bicubic
resize (PIL-exact, see ``pil_resample``), center crop, 1/255 rescale, CLIP
mean/std normalize, HWC->CHW.

Two paths:
- ``__call__``: host numpy, bit-exact vs the HF/PIL stack (greedy-parity path);
- ``device_preprocess``: a single fused XLA computation (uint8 in HBM ->
  normalized bf16 CHW) for the serving/TTFT path — float bicubic, off by
  <=1/255 quantization vs host.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Union

import numpy as np

from .pil_resample import center_crop, resize_uint8, shortest_edge_size

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class ImageProcessor:
    """HF CLIPImageProcessor-compatible preprocessing."""

    def __init__(
        self,
        image_size: int = 224,
        crop_size: Optional[int] = None,
        image_mean: Sequence[float] = CLIP_MEAN,
        image_std: Sequence[float] = CLIP_STD,
        do_resize: bool = True,
        do_center_crop: bool = True,
        do_rescale: bool = True,
        do_normalize: bool = True,
        rescale_factor: float = 1.0 / 255.0,
        resample: str = "bicubic",
        patch_size: int = 14,
        use_native: bool = True,
    ):
        self.image_size = image_size
        self.crop_size = crop_size if crop_size is not None else image_size
        self.image_mean = tuple(image_mean)
        self.image_std = tuple(image_std)
        self.do_resize = do_resize
        self.do_center_crop = do_center_crop
        self.do_rescale = do_rescale
        self.do_normalize = do_normalize
        self.rescale_factor = rescale_factor
        self.resample = resample
        self.patch_size = patch_size  # attached by the reference (modeling_utils.py:131)
        self._native = False
        if use_native:
            try:
                from . import native_img

                self._native = native_img.available()
            except Exception:
                self._native = False

    # -- host path ------------------------------------------------------------

    def _to_rgb_array(self, image) -> np.ndarray:
        """Accept PIL.Image / path / (H, W, 3) uint8 array."""
        if isinstance(image, str):
            from PIL import Image

            image = Image.open(image)
        if hasattr(image, "convert"):  # PIL image
            image = np.asarray(image.convert("RGB"))
        image = np.asarray(image)
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=-1)
        if image.dtype != np.uint8:
            raise ValueError(f"expected uint8 image, got {image.dtype}")
        return image

    def preprocess_one(self, image) -> np.ndarray:
        """One image -> (3, crop, crop) float32."""
        arr = self._to_rgb_array(image)
        if (self._native and self.do_resize and self.do_center_crop
                and self.do_rescale and self.do_normalize
                and self.rescale_factor == 1.0 / 255.0):
            from . import native_img

            return native_img.clip_preprocess(
                arr, self.image_size, self.crop_size,
                self.image_mean, self.image_std, self.resample,
            )
        if self.do_resize:
            h, w = arr.shape[:2]
            nh, nw = shortest_edge_size(h, w, self.image_size)
            arr = resize_uint8(arr, (nw, nh), self.resample)
        if self.do_center_crop:
            arr = center_crop(arr, self.crop_size, self.crop_size)
        x = arr.astype(np.float32)
        if self.do_rescale:
            x = x * np.float32(self.rescale_factor)
        if self.do_normalize:
            x = (x - np.asarray(self.image_mean, np.float32)) / np.asarray(
                self.image_std, np.float32
            )
        return x.transpose(2, 0, 1)

    def __call__(self, images, return_tensors: str = "np"):
        if not isinstance(images, (list, tuple)):
            images = [images]
        pixel_values = np.stack([self.preprocess_one(im) for im in images])
        return {"pixel_values": pixel_values}

    # -- config I/O (reads the reference checkpoints' preprocessor_config.json)

    @classmethod
    def from_pretrained(cls, path: str) -> "ImageProcessor":
        cfg_path = (
            os.path.join(path, "preprocessor_config.json")
            if os.path.isdir(path)
            else path
        )
        with open(cfg_path) as f:
            d = json.load(f)
        size = d.get("size", 224)
        if isinstance(size, dict):
            size = size.get("shortest_edge") or size.get("height", 224)
        crop = d.get("crop_size", size)
        if isinstance(crop, dict):
            crop = crop.get("height", 224)
        # PIL resampling filter codes (Image.Resampling): 2=bilinear,
        # 3=bicubic — CLIP checkpoints ship 3, but honor bilinear configs
        resample = {2: "bilinear", 3: "bicubic"}.get(d.get("resample", 3),
                                                     "bicubic")
        return cls(
            image_size=size,
            crop_size=crop,
            image_mean=d.get("image_mean", CLIP_MEAN),
            image_std=d.get("image_std", CLIP_STD),
            do_resize=d.get("do_resize", True),
            do_center_crop=d.get("do_center_crop", True),
            do_rescale=d.get("do_rescale", True),
            do_normalize=d.get("do_normalize", True),
            rescale_factor=d.get("rescale_factor", 1.0 / 255.0),
            resample=resample,
        )

    def save_pretrained(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
            json.dump(
                {
                    "image_processor_type": "CLIPImageProcessor",
                    "size": {"shortest_edge": self.image_size},
                    "crop_size": {"height": self.crop_size, "width": self.crop_size},
                    "image_mean": list(self.image_mean),
                    "image_std": list(self.image_std),
                    "do_resize": self.do_resize,
                    "do_center_crop": self.do_center_crop,
                    "do_rescale": self.do_rescale,
                    "do_normalize": self.do_normalize,
                    "rescale_factor": self.rescale_factor,
                    "resample": 3,
                },
                f,
                indent=2,
            )


# ---------------------------------------------------------------------------
# fused on-device path (serving/TTFT)
# ---------------------------------------------------------------------------

def _device_bicubic_matrix(in_size: int, out_size: int):
    """Float resample matrix (out, in) — same kernel/normalization as Pillow
    but without the 8-bit fixed-point quantization."""
    from .pil_resample import _coeffs, PRECISION_BITS  # noqa: SLF001

    xmin, kk, ksize = _coeffs(in_size, out_size, "bicubic")
    M = np.zeros((out_size, in_size), np.float32)
    rows = np.repeat(np.arange(out_size), ksize)
    cols = (xmin[:, None] + np.arange(ksize)[None, :]).reshape(-1)
    vals = (kk.astype(np.float64) / (1 << PRECISION_BITS)).astype(np.float32).reshape(-1)
    ok = cols < in_size
    np.add.at(M, (rows[ok], cols[ok]), vals[ok])
    return M


def device_preprocess(
    images_u8,  # (B, H, W, 3) uint8 jnp array (decoded on host, raw bytes shipped)
    *,
    out_size: int = 224,
    mean=CLIP_MEAN,
    std=CLIP_STD,
    dtype=None,
):
    """Fused resize+crop+normalize on-device: one XLA computation, matmul-based
    separable bicubic (rides the MXU), minimal HBM traffic (uint8 in).

    Assumes same-size batch (static shapes).  Short side maps to ``out_size``
    then center-crops, mirroring the host path.
    """
    import jax.numpy as jnp

    B, H, W, C = images_u8.shape
    nh, nw = shortest_edge_size(H, W, out_size)
    Mh = jnp.asarray(_device_bicubic_matrix(H, nh))  # (nh, H)
    Mw = jnp.asarray(_device_bicubic_matrix(W, nw))  # (nw, W)
    x = images_u8.astype(jnp.float32)
    # horizontal then vertical, like the host path (no quantization between)
    x = jnp.einsum("ow,bhwc->bhoc", Mw, x)
    x = jnp.einsum("oh,bhwc->bowc", Mh, x)
    x = jnp.clip(x, 0.0, 255.0)
    top = (nh - out_size) // 2
    left = (nw - out_size) // 2
    x = x[:, top : top + out_size, left : left + out_size, :]
    x = x * (1.0 / 255.0)
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    x = x.transpose(0, 3, 1, 2)
    return x.astype(dtype) if dtype is not None else x
