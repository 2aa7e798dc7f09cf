"""Camera image preprocessing for the ViT encoder.

Replaces the reference's JPEG re-encode to base64 data-URLs
(`src/agents/content_transform/camera_agent.py:130-138`) — there is no
remote API to feed anymore, so images go straight to the on-TPU encoder:
one fused jit program does uint8 -> float, bilinear resize to the ViT
input size, and SigLIP-style [-1, 1] normalization for all views at once.
Patchify folds into the encoder's first projection (a matmul on the MXU).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("size",))
def preprocess_images(images: jax.Array, size: int = 224) -> jax.Array:
    """(B, H, W, 3) uint8 -> (B, size, size, 3) float32 in [-1, 1]."""
    x = images.astype(jnp.float32) / 255.0
    x = jax.image.resize(
        x, (images.shape[0], size, size, 3), method="bilinear", antialias=False
    )
    return x * 2.0 - 1.0


def stack_views(images: List[np.ndarray]) -> np.ndarray:
    """Host helper: list of HxWx3 uint8 -> one (B, H, W, 3) batch."""
    return np.stack(images, axis=0)
