"""Semantic segmentation: high-touch / low-touch probability maps.

The reference runs an externally-trained TorchScript CNN through
libtorch (`/root/reference/segmentation/inference.cc:62-99`): resize the
RGB frame to a /32 multiple, HWC->NCHW float tensor, forward, split the
2-channel output into ht/lt probability maps, resize back; with an
empty model path it degrades to all-ones maps (`inference.cc:50-52`) so
the rest of the pipeline runs without a model.

TPU-native equivalent: a compact NHWC UNet in flax (bfloat16 compute,
fp32 params — MXU-friendly convs), a jitted `InferenceEngine` facade
with identical resize/fake-mode semantics, flax-serialization
checkpoints, and an optional optax training step (the reference ships
no trainer; this closes that gap for users who need to fit the model).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    from flax import serialization
except ImportError:  # pragma: no cover
    nn = None
    serialization = None


if nn is not None:

    class ConvBlock(nn.Module):
        features: int
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            for _ in range(2):
                x = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
                x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x)
                x = nn.relu(x)
            return x

    class SegmentationNet(nn.Module):
        """Small UNet: encoder/decoder with skip connections, 2-channel
        (high-touch, low-touch) logits at input resolution."""

        widths: Sequence[int] = (32, 64, 128, 256)
        num_classes: int = 2
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):  # [N, H, W, 3] float in [0, 1]
            x = x.astype(self.dtype)
            skips = []
            for w in self.widths[:-1]:
                x = ConvBlock(w, self.dtype)(x)
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvBlock(self.widths[-1], self.dtype)(x)
            for w, skip in zip(reversed(self.widths[:-1]), reversed(skips)):
                n, h, ww, c = x.shape
                x = jax.image.resize(x, (n, h * 2, ww * 2, c), "nearest")
                x = nn.Conv(w, (3, 3), dtype=self.dtype)(x)
                x = jnp.concatenate([x, skip], axis=-1)
                x = ConvBlock(w, self.dtype)(x)
            logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(x)
            return logits  # [N, H, W, 2]


def _pad_to_multiple(h: int, w: int, m: int = 32) -> Tuple[int, int]:
    """Reference resizes to the nearest /32 multiple
    (`inference.cc:71-76`); we round up."""
    return ((h + m - 1) // m) * m, ((w + m - 1) // m) * m


class InferenceEngine:
    """Per-frame ht/lt inference (reference `inference_engine` API).

    `model_path=None` -> fake mode: all-ones maps, letting the full
    pipeline run without a trained model (`inference.cc:50-52`).
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        width: int = 640,
        height: int = 480,
        widths: Sequence[int] = (32, 64, 128, 256),
    ):
        self.fake = model_path is None
        self.width = width
        self.height = height
        if self.fake:
            return
        if nn is None:
            raise RuntimeError("flax unavailable; only fake mode supported")
        self.net = SegmentationNet(widths=tuple(widths))
        ph, pw = _pad_to_multiple(height, width)
        dummy = jnp.zeros((1, ph, pw, 3), jnp.float32)
        params = self.net.init(jax.random.PRNGKey(0), dummy)
        if model_path != "__random__":
            with open(model_path, "rb") as f:
                params = serialization.from_bytes(params, f.read())
        self.params = params
        self._forward = jax.jit(
            functools.partial(self._apply, net=self.net)
        )

    @staticmethod
    def _apply(params, x, *, net):
        logits = net.apply(params, x)
        prob = jax.nn.softmax(logits, axis=-1)
        return prob[..., 0], prob[..., 1]  # ht, lt

    def infer_one(self, rgb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[H, W, 3] uint8/float RGB -> (ht, lt) float32 prob maps at the
        engine's configured output size."""
        if self.fake:
            shape = (self.height, self.width)
            return (
                np.ones(shape, np.float32),
                np.ones(shape, np.float32),
            )
        h, w = rgb.shape[:2]
        ph, pw = _pad_to_multiple(h, w)
        x = jnp.asarray(rgb, jnp.float32) / 255.0
        x = jnp.pad(x, ((0, ph - h), (0, pw - w), (0, 0)))
        ht, lt = self._forward(self.params, x[None])
        ht = np.asarray(ht[0, :h, :w], np.float32)
        lt = np.asarray(lt[0, :h, :w], np.float32)
        if (h, w) != (self.height, self.width):
            import cv2

            ht = cv2.resize(ht, (self.width, self.height))
            lt = cv2.resize(lt, (self.width, self.height))
        return ht, lt

    def save(self, path: str) -> None:
        assert not self.fake, "fake engine has no parameters"
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.params))


def make_train_step(net, optimizer):
    """Cross-entropy training step (optax) for the segmentation net.

    Labels: [N, H, W] int32 in {0 (high-touch), 1 (low-touch)}, with
    -1 = unlabeled (masked out).
    """
    import optax

    def loss_fn(params, x, y):
        logits = net.apply(params, x)
        mask = (y >= 0).astype(jnp.float32)
        yc = jnp.maximum(y, 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, yc)
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def _bench(argv=None) -> dict:
    """Segmentation inference micro-benchmark — the reference's
    1000-iteration timing harness
    (`/root/reference/examples/segmentation_inference/main.cc:48-60`).

        python -m ra_slam_tpu.models.segmentation --iters 1000
    """
    import argparse
    import json
    import time

    p = argparse.ArgumentParser(description="segmentation latency bench")
    p.add_argument("--model", default=None, help="checkpoint (None = random init)")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--iters", type=int, default=1000)
    args = p.parse_args(argv)

    eng = InferenceEngine(
        args.model or "__random__", width=args.width, height=args.height
    )
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (args.height, args.width, 3), dtype=np.uint8)

    ht, lt = eng.infer_one(rgb)  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ht, lt = eng.infer_one(rgb)
    dt = (time.perf_counter() - t0) / args.iters
    out = {
        "metric": "segmentation_latency_ms",
        "value": round(dt * 1e3, 3),
        "fps": round(1.0 / dt, 1),
        "iters": args.iters,
        "shape": [args.height, args.width],
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    _bench()
